"""Hand-written Pallas TPU kernels (the NATTEN / FlashAttention-2
replacements; reference image_transformer_v2.py:343-443)."""

import contextlib

_FORCE_XLA = False


@contextlib.contextmanager
def force_xla():
    """Routes all attention dispatchers to their pure-XLA paths. Needed for
    forward-mode autodiff (jax.jvp, e.g. log_likelihood) which custom_vjp
    Pallas kernels do not support."""
    global _FORCE_XLA
    old = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = old


def xla_forced():
    return _FORCE_XLA


def train_fusion_enabled():
    """Whether the TRAINING path routes through the fused Pallas forward
    kernels (their custom_vjp backwards run the standard residual VJPs; see
    fused_qkv/fused_ffn). On by default — measured +7% full-step throughput
    on the flagship (PERFORMANCE.md); KDT_TRAIN_FUSION=0 restores the
    unfused XLA prologue/FFN in training for A/B measurements."""
    import os
    return os.environ.get("KDT_TRAIN_FUSION", "1") == "1"


from .na2d import na2d, na2d_packed, na2d_packed_proj, na2d_reference  # noqa: E402
from .flash import flash_attention  # noqa: E402
from .global_packed import packed_global_attention, packed_global_ok  # noqa: E402
from .fused_ffn import fused_geglu_ffn  # noqa: E402
from .fused_qkv import fused_qkv_prologue  # noqa: E402
from .fused_mapping import fused_mapping  # noqa: E402

__all__ = ["na2d", "na2d_packed", "na2d_packed_proj", "na2d_reference",
           "flash_attention", "packed_global_attention", "packed_global_ok",
           "fused_geglu_ffn", "fused_qkv_prologue",
           "fused_mapping", "force_xla", "xla_forced",
           "train_fusion_enabled"]
