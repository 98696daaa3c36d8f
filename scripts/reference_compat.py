"""Import the reference torch k-diffusion (/root/reference) on a CPU-only box.

The reference imports several packages that are absent here (jsonmerge,
torchsde, torchdiffeq, dctorch, skimage, torchvision, cleanfid, clip) but
only *uses* them on code paths the parity harness never touches (SDE noise
samplers, torch log-likelihood, DCT loss weighting at call time, CPU
augmentations, FID).  ``load_reference()`` installs minimal stubs for those
modules, forces eager mode (K_DIFFUSION_USE_COMPILE=0 — reference
models/flags.py:10-14 reads it at import), puts /root/reference on sys.path
and returns the imported ``k_diffusion`` module.

jsonmerge.merge is the one stub that must be *behaviorally* right: the
reference config loader (reference k_diffusion/config.py:100) deep-merges
user configs over defaults, so the stub implements recursive dict merge.

Used by scripts/port_reference_checkpoint.py and tests/test_reference_parity.py.
"""

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for key, value in attrs.items():
        setattr(mod, key, value)
    return mod


def _deep_merge(base, head):
    """jsonmerge.merge semantics for plain JSON: head wins, dicts recurse."""
    if isinstance(base, dict) and isinstance(head, dict):
        out = dict(base)
        for key, value in head.items():
            out[key] = _deep_merge(base.get(key), value) if key in base else value
        return out
    return head


def _na2d_starts(length, kernel_size):
    """NATTEN clamped-window starts: query i's k-window begins at
    clamp(i - (k-1)//2, 0, length - k), so edge queries see a full window
    shifted inward (NATTEN's documented semantics; the same rule as this
    repo's k_diffusion_tpu/ops/attention.py:neighborhood_mask_1d)."""
    import torch

    idx = torch.arange(length)
    return (idx - (kernel_size - 1) // 2).clamp(0, max(length - kernel_size, 0))


def _na2d_neighbors(t, kernel_size):
    """Gather each (i, j)'s k x k clamped neighborhood from a
    (n, heads, H, W, e) map -> (n, heads, H, k, W, k, e)."""
    import torch

    H, W = t.shape[2], t.shape[3]
    ii = _na2d_starts(H, kernel_size)[:, None] + torch.arange(kernel_size)
    jj = _na2d_starts(W, kernel_size)[:, None] + torch.arange(kernel_size)
    return t[:, :, ii][:, :, :, :, jj]


def _na2d_qk(q, k, kernel_size, *args, **kwargs):
    """Naive einsum+gather equivalent of natten.functional.na2d_qk for the
    reference's unfused call site (reference
    k_diffusion/models/image_transformer_v2.py:431-443): q/k (n, heads, H, W,
    e) -> logits (n, heads, H, W, k*k), neighbors row-major in (di, dj)."""
    import torch

    knbr = _na2d_neighbors(k, kernel_size)
    logits = torch.einsum("ncije,nciajbe->ncijab", q, knbr)
    n, c, H, W = logits.shape[:4]
    return logits.reshape(n, c, H, W, kernel_size * kernel_size)


def _na2d_av(a, v, kernel_size, *args, **kwargs):
    """Naive counterpart of natten.functional.na2d_av: a (n, heads, H, W,
    k*k) softmaxed weights, v (n, heads, H, W, e) -> (n, heads, H, W, e)."""
    import torch

    n, c, H, W = a.shape[:4]
    a6 = a.reshape(n, c, H, W, kernel_size, kernel_size)
    vnbr = _na2d_neighbors(v, kernel_size)
    return torch.einsum("ncijab,nciajbe->ncije", a6, vnbr)


def install_stubs():
    _stub("jsonmerge", merge=_deep_merge)

    # natten: CUDA-only upstream. The stub implements the unfused
    # na2d_qk/na2d_av contract with plain torch gather+einsum so the
    # reference NeighborhoodSelfAttentionBlock runs on CPU — an
    # *independent* implementation of the clamped-window semantics that the
    # parity tests check this repo's NA blocks against end-to-end.
    nat = _stub("natten", has_fused_na=lambda: False)
    nat.functional = _stub(
        "natten.functional", na2d_qk=_na2d_qk, na2d_av=_na2d_av)

    class _BrownianTree:  # never called in the parity paths
        def __init__(self, *args, **kwargs):
            raise RuntimeError("torchsde stub: BrownianTree unavailable")

    _stub("torchsde", BrownianTree=_BrownianTree)
    _stub("torchdiffeq", odeint=None)

    dct = _stub("dctorch")
    dct.functional = _stub("dctorch.functional")

    sk = _stub("skimage")
    sk.transform = _stub("skimage.transform")

    tv = _stub("torchvision")
    tv.transforms = _stub("torchvision.transforms")
    tv.transforms.functional = _stub("torchvision.transforms.functional")
    tv.datasets = _stub("torchvision.datasets")
    tv.utils = _stub("torchvision.utils")

    cf = _stub("cleanfid")
    cf.inception_torchscript = _stub(
        "cleanfid.inception_torchscript", InceptionV3W=object
    )
    _stub("clip")


_REF_CACHE = None


def load_reference():
    """Install stubs and return the reference ``k_diffusion`` module.

    This repo ships its own ``k_diffusion`` alias package (re-exporting
    k_diffusion_tpu), so the import is done with the ``k_diffusion*`` entries
    temporarily evicted from sys.modules and restored afterwards: the
    reference module object keeps references to its own submodules, while
    later ``import k_diffusion`` in the same process still resolves to
    whatever it did before.
    """
    global _REF_CACHE
    if _REF_CACHE is not None:
        return _REF_CACHE
    os.environ["K_DIFFUSION_USE_COMPILE"] = "0"
    install_stubs()

    saved = {
        name: mod
        for name, mod in list(sys.modules.items())
        if name == "k_diffusion" or name.startswith("k_diffusion.")
    }
    for name in saved:
        del sys.modules[name]
    saved_path = list(sys.path)
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import k_diffusion as ref_k  # noqa: PLC0415

        if not os.path.realpath(ref_k.__file__).startswith(
            os.path.realpath(REFERENCE_ROOT)
        ):
            raise ImportError(
                f"expected the reference k_diffusion from {REFERENCE_ROOT}, "
                f"got {ref_k.__file__} (the repo alias package shadowed it?)"
            )
    finally:
        for name in [
            n
            for n in sys.modules
            if n == "k_diffusion" or n.startswith("k_diffusion.")
        ]:
            del sys.modules[name]
        sys.modules.update(saved)
        sys.path[:] = saved_path
    _REF_CACHE = ref_k
    return ref_k
