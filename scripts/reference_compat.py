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


def install_stubs():
    _stub("jsonmerge", merge=_deep_merge)

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
