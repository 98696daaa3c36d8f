#!/usr/bin/env python3
"""One-command converter: NVIDIA StyleGAN-ADA InceptionV3W torchscript ->
.npz for the pure-JAX extractor (models/inception_v3.py).

The reference downloads inception-2015-12-05.pt at runtime (reference
k_diffusion/evaluation.py:16-31); this environment has no egress, so FID
parity is one file-drop away: obtain the .pt on any machine from
  https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/pretrained/metrics/inception-2015-12-05.pt
then run
  python scripts/convert_inception_weights.py inception-2015-12-05.pt \
      ~/.cache/k-diffusion/inception-2015-12-05.npz
and `make_extractor('inception')` (and train.py --evaluate-with inception)
picks it up. The converter validates every conv kernel shape against the
architecture contract before writing.
"""

import argparse
import os
from pathlib import Path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", type=Path, help="inception-2015-12-05.pt (torchscript)")
    p.add_argument("dst", type=Path, nargs="?",
                   help="output .npz (default: alongside src)")
    args = p.parse_args()
    dst = args.dst or args.src.with_suffix(".npz")

    import numpy as np
    import torch

    model = torch.jit.load(str(args.src), map_location="cpu")
    items = [(k, v.detach().cpu().numpy())
             for k, v in model.state_dict().items()]

    # validate through the strict flax-tree conversion before writing
    os.environ.setdefault("KDT_PLATFORM", "cpu")
    from k_diffusion_tpu.models import inception_v3
    inception_v3.params_from_torch_state_dict(items)

    dst.parent.mkdir(parents=True, exist_ok=True)
    np.savez(dst, **{f"arr_{i:04d}_{k}": v for i, (k, v) in enumerate(items)})
    print(f"Wrote {dst} ({len(items)} tensors); verified against the "
          f"InceptionV3W architecture contract.")


if __name__ == "__main__":
    main()
