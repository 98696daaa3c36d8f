"""Named checkpoint residuals for the Pallas kernels.

Under ``jax.checkpoint`` the custom_vjp residuals of the attention kernels
(q/k/v maps, kernel output, per-head logsumexp) are discarded and the forward
kernels re-run during the backward pass. Tagging them with
``jax.ad_checkpoint.checkpoint_name`` lets a ``save_only_these_names`` remat
policy keep exactly these (cheap: O(b*h*w*c) each) while still rematerializing
the wide FFN hidden activations — the policy exposed as
``remat_policy="save_only_attn_residuals"`` on the HDiT model
(models/image_transformer_v2.py). No reference analog: the reference's
``checkpointing`` flag is all-or-nothing torch.utils.checkpoint
(/root/reference/k_diffusion/models/image_transformer_v2.py:44-49).
"""

import jax
from jax.ad_checkpoint import checkpoint_name

# the attention kernel's output + per-head logsumexp: cheap to keep
# (O(b*h*w*(c+heads))), and keeping them elides the whole attention-forward
# re-run in the rematerialized backward (dq/dkv read them directly)
ATTN_OUT = "attn_out"
# the q/k/v tensors consumed by the attention kernel. For the global/flash
# paths these are the plain maps (3 x b*h*w*c). For the packed NA path the
# named residuals are q plus the column-grouped K/V HALO SLABS
# (na2d._extract_halos_cg output, ~(tq+k-1)/tq * (gc+k-1)/gc per-axis
# duplication ≈ 1.5-2x larger than the raw maps EACH at the shipped train
# tiles) — so a save_only_these_names policy keeping ATTN_QKV holds
# ~q + 2*(1.5-2x) maps, not 3 maps.
ATTN_QKV = "attn_qkv"
# the fused prologue's raw qkv projection (b*h*w*3c): keeping it elides the
# prologue matmul re-run (only the cheap VPU mid-chain is recomputed)
QKV_RAW = "qkv_raw"


def name_tree(res, name):
    """Tag every leaf of a residual pytree with a checkpoint_name."""
    return jax.tree_util.tree_map(lambda t: checkpoint_name(t, name), res)
