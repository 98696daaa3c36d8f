"""Port a reference (crowsonkb/k-diffusion, torch) checkpoint into this
repo's flax param trees.

The reference stores torch ``state_dict``s (reference train.py:397-423 saves
``{'model': ..., 'model_ema': ...}`` with the denoiser-wrapper prefix
``inner_model.``).  This script translates those flat torch key/value maps
into the nested flax ``params`` trees of the three model families here:

- image_transformer_v2 (HDiT, reference models/image_transformer_v2.py:667-762)
- image_transformer_v1 (flat ViT, reference models/image_transformer_v1.py:280-344)
- image_v1 (EDM U-Net, reference models/image_v1.py:89-176)

Layout conversions applied:
- torch ``nn.Linear`` weight (out, in)        -> flax Dense kernel (in, out)
- torch ``nn.Conv2d`` weight (O, I, kh, kw)   -> flax Conv kernel (kh, kw, I, O)
- FourierFeatures buffer (out//2, in)         -> ``basis`` param (in, out//2)
- ``nn.Embedding`` weight                      -> unchanged
- fixed resample kernels / deterministic RoPE freq buffers -> verified against
  this repo's closed-form values, then dropped (no param on this side)

The flattening orders (qkv head packing, TokenMerge/Split (ph, pw, c) channel
order, ITv1 (c, ph, pw) token order, AdaGN [weight, bias] chunk order) agree
between the two implementations by construction, so plain transposes suffice;
tests/test_reference_parity.py asserts forward equality through this port.

CLI: python scripts/port_reference_checkpoint.py --config CFG --checkpoint
IN.pth --output OUT.safetensors [--use-ema]  writes a safetensors params file
loadable by sample.py / checkpoint.load_params_safetensors.
"""

import argparse
import re
import sys

import numpy as np


def _np(t):
    """torch tensor (or ndarray) -> float32/int numpy array."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _T(t):
    return _np(t).T


def _conv(t):
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return _np(t).transpose(2, 3, 1, 0)


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    if path[-1] in node:
        raise ValueError(f"duplicate param path {path}")
    node[path[-1]] = value


def strip_prefix(sd, prefix="inner_model."):
    """Drop a wrapper prefix (Denoiser/augment wrapper) from state_dict keys."""
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return dict(sd)


def _check_freqs_v2(value, path):
    """Reference HDiT AxialRoPE freqs are a deterministic buffer
    (reference image_transformer_v2.py:234-240); assert ours matches."""
    from k_diffusion_tpu import ops

    ref = _np(value)
    n_heads, quarter = ref.shape
    # ops.axial_rope_freqs(dim, n_heads) returns (n_heads, dim//4)
    ours = np.asarray(ops.axial_rope_freqs(quarter * 4, n_heads))
    if not np.allclose(ref, ours, rtol=1e-5, atol=1e-6):
        raise ValueError(
            f"deterministic RoPE freqs mismatch at {path}: the reference "
            "buffer does not equal this repo's closed-form values")


# ---------------------------------------------------------------------------
# image_transformer_v2 (HDiT)

_V2_STATIC = {
    "patch_in.proj.weight": (("patch_in", "proj", "kernel"), _T),
    "time_emb.weight": (("time_emb", "basis"), _T),
    "time_in_proj.weight": (("time_in_proj", "kernel"), _T),
    "aug_emb.weight": (("aug_emb", "basis"), _T),
    "aug_in_proj.weight": (("aug_in_proj", "kernel"), _T),
    "class_emb.weight": (("class_emb", "embedding"), _np),
    "mapping_cond_in_proj.weight": (("mapping_cond_in_proj", "kernel"), _T),
    "mapping.in_norm.scale": (("mapping", "in_norm", "scale"), _np),
    "mapping.out_norm.scale": (("mapping", "out_norm", "scale"), _np),
    "out_norm.scale": (("out_norm", "scale"), _np),
    "patch_out.proj.weight": (("patch_out", "proj", "kernel"), _T),
}

# per-transformer-layer params (shared by v2 level blocks)
_V2_BLOCK = {
    "self_attn.norm.linear.weight": (("self_attn", "norm", "mapping_linear", "kernel"), _T),
    "self_attn.qkv_proj.weight": (("self_attn", "qkv_proj", "kernel"), _T),
    "self_attn.scale": (("self_attn", "scale"), _np),
    "self_attn.out_proj.weight": (("self_attn", "out_proj", "kernel"), _T),
    "ff.norm.linear.weight": (("ff", "norm", "mapping_linear", "kernel"), _T),
    "ff.up_proj.weight": (("ff", "up_proj", "kernel"), _T),
    "ff.down_proj.weight": (("ff", "down_proj", "kernel"), _T),
}


def port_image_transformer_v2(sd):
    """Reference HDiT state_dict -> flax params
    (reference models/image_transformer_v2.py:667-762)."""
    params = {}
    for key, value in sd.items():
        if key in _V2_STATIC:
            path, fn = _V2_STATIC[key]
            _set(params, path, fn(value))
            continue
        m = re.fullmatch(r"mapping\.blocks\.(\d+)\.(norm\.scale|up_proj\.weight|down_proj\.weight)", key)
        if m:
            idx, rest = int(m.group(1)), m.group(2)
            sub, leaf = rest.split(".")
            fn = _np if leaf == "scale" else _T
            leafname = "scale" if leaf == "scale" else "kernel"
            _set(params, ("mapping", f"block_{idx}", sub, leafname), fn(value))
            continue
        m = re.fullmatch(r"(down_levels|up_levels)\.(\d+)\.(\d+)\.(.+)", key)
        if m:
            side = "down" if m.group(1) == "down_levels" else "up"
            lvl, j, rest = int(m.group(2)), int(m.group(3)), m.group(4)
            block = f"{side}_{lvl}_layer_{j}"
            if rest == "self_attn.pos_emb.freqs":
                _check_freqs_v2(value, key)
                continue
            path, fn = _V2_BLOCK[rest]
            _set(params, (block,) + path, fn(value))
            continue
        m = re.fullmatch(r"mid_level\.(\d+)\.(.+)", key)
        if m:
            j, rest = int(m.group(1)), m.group(2)
            if rest == "self_attn.pos_emb.freqs":
                _check_freqs_v2(value, key)
                continue
            path, fn = _V2_BLOCK[rest]
            _set(params, (f"mid_layer_{j}",) + path, fn(value))
            continue
        m = re.fullmatch(r"merges\.(\d+)\.proj\.weight", key)
        if m:
            _set(params, (f"merge_{m.group(1)}", "proj", "kernel"), _T(value))
            continue
        m = re.fullmatch(r"splits\.(\d+)\.proj\.weight", key)
        if m:
            _set(params, (f"split_{m.group(1)}", "proj", "kernel"), _T(value))
            continue
        m = re.fullmatch(r"splits\.(\d+)\.fac", key)
        if m:
            _set(params, (f"split_{m.group(1)}", "fac"), _np(value).reshape(1))
            continue
        raise ValueError(f"unmapped reference HDiT key: {key}")
    return params


# ---------------------------------------------------------------------------
# image_transformer_v1 (flat ViT)

_V1T_STATIC = {
    "in_proj.weight": (("in_proj", "kernel"), _T),
    "time_emb.weight": (("time_emb", "basis"), _T),
    "time_in_proj.weight": (("time_in_proj", "kernel"), _T),
    "aug_emb.weight": (("aug_emb", "basis"), _T),
    "aug_in_proj.weight": (("aug_in_proj", "kernel"), _T),
    "class_emb.weight": (("class_emb", "embedding"), _np),
    "mapping.in_norm.scale": (("mapping", "in_norm", "scale"), _np),
    "mapping.out_norm.scale": (("mapping", "out_norm", "scale"), _np),
    "out_norm.scale": (("out_norm", "scale"), _np),
    "out_proj.weight": (("out_proj", "kernel"), _T),
}

_V1T_BLOCK = {
    "self_attn.norm.linear.weight": (("self_attn", "norm", "mapping_linear", "kernel"), _T),
    "self_attn.qkv_proj.weight": (("self_attn", "qkv_proj", "kernel"), _T),
    "self_attn.qk_norm.scale": (("self_attn", "qk_scale"), _np),
    "self_attn.pos_emb.freqs_h": (("self_attn", "pos_emb", "freqs_h"), _np),
    "self_attn.pos_emb.freqs_w": (("self_attn", "pos_emb", "freqs_w"), _np),
    "self_attn.out_proj.weight": (("self_attn", "out_proj", "kernel"), _T),
    "ff.norm.linear.weight": (("ff", "norm", "mapping_linear", "kernel"), _T),
    "ff.up_proj.weight": (("ff", "up_proj", "kernel"), _T),
    "ff.down_proj.weight": (("ff", "down_proj", "kernel"), _T),
}


def port_image_transformer_v1(sd):
    """Reference ITv1 state_dict -> flax params
    (reference models/image_transformer_v1.py:280-344)."""
    params = {}
    for key, value in sd.items():
        if key in _V1T_STATIC:
            path, fn = _V1T_STATIC[key]
            _set(params, path, fn(value))
            continue
        m = re.fullmatch(r"mapping\.blocks\.(\d+)\.(norm\.scale|up_proj\.weight|down_proj\.weight)", key)
        if m:
            idx, rest = int(m.group(1)), m.group(2)
            sub, leaf = rest.split(".")
            fn = _np if leaf == "scale" else _T
            leafname = "scale" if leaf == "scale" else "kernel"
            _set(params, ("mapping", f"block_{idx}", sub, leafname), fn(value))
            continue
        m = re.fullmatch(r"blocks\.(\d+)\.(.+)", key)
        if m:
            j, rest = int(m.group(1)), m.group(2)
            path, fn = _V1T_BLOCK[rest]
            _set(params, (f"block_{j}",) + path, fn(value))
            continue
        raise ValueError(f"unmapped reference ITv1 key: {key}")
    return params


# ---------------------------------------------------------------------------
# image_v1 (EDM U-Net)

_RES_INNER = {
    "main.0.mapper.weight": (("norm_1", "mapper", "kernel"), _T),
    "main.0.mapper.bias": (("norm_1", "mapper", "bias"), _np),
    "main.2.weight": (("conv_1", "kernel"), _conv),
    "main.2.bias": (("conv_1", "bias"), _np),
    "main.4.mapper.weight": (("norm_2", "mapper", "kernel"), _T),
    "main.4.mapper.bias": (("norm_2", "mapper", "bias"), _np),
    "main.6.weight": (("conv_2", "kernel"), _conv),
    "main.6.bias": (("conv_2", "bias"), _np),
    "skip.weight": (("skip", "kernel"), _conv),
}

_ATTN_INNER = {
    "norm_in.mapper.weight": (("norm_in", "mapper", "kernel"), _T),
    "norm_in.mapper.bias": (("norm_in", "mapper", "bias"), _np),
    "qkv_proj.weight": (("qkv_proj", "kernel"), _conv),
    "qkv_proj.bias": (("qkv_proj", "bias"), _np),
    "out_proj.weight": (("out_proj", "kernel"), _conv),
    "out_proj.bias": (("out_proj", "bias"), _np),
}

_CROSS_INNER = {
    "norm_dec.mapper.weight": (("norm_dec", "mapper", "kernel"), _T),
    "norm_dec.mapper.bias": (("norm_dec", "mapper", "bias"), _np),
    "norm_enc.weight": (("norm_enc", "scale"), _np),
    "norm_enc.bias": (("norm_enc", "bias"), _np),
    "q_proj.weight": (("q_proj", "kernel"), _conv),
    "q_proj.bias": (("q_proj", "bias"), _np),
    "kv_proj.weight": (("kv_proj", "kernel"), _T),
    "kv_proj.bias": (("kv_proj", "bias"), _np),
    "out_proj.weight": (("out_proj", "kernel"), _conv),
    "out_proj.bias": (("out_proj", "bias"), _np),
}


def _check_resample_kernel(value, path):
    """Down/Upsample2d kernels are fixed low-pass filters on both sides
    (reference layers.py:236-262); nothing to port, just sanity-check."""
    v = _np(value)
    if v.ndim != 2 or v.shape[0] != v.shape[1]:
        raise ValueError(f"unexpected resample kernel shape at {path}: {v.shape}")


def port_image_v1(sd):
    """Reference image_v1 state_dict -> flax params (reference
    models/image_v1.py:89-176).  The reference's interleaved Sequential
    blocks (reference image_v1.py:32-77: [resample?, res, attn?, cross?,
    ...]) are classified per index by their param names and mapped onto this
    repo's named stacks (u_net_d_{lvl}/res_{i}, attn_{i}, cross_{i})."""
    params = {}
    static = {
        "timestep_embed.weight": (("timestep_embed", "basis"), _T),
        "mapping_cond.weight": (("mapping_cond", "kernel"), _T),
        "mapping.0.weight": (("mapping", "linear_0", "kernel"), _T),
        "mapping.0.bias": (("mapping", "linear_0", "bias"), _np),
        "mapping.2.weight": (("mapping", "linear_1", "kernel"), _T),
        "mapping.2.bias": (("mapping", "linear_1", "bias"), _np),
        "proj_in.weight": (("proj_in", "kernel"), _conv),
        "proj_in.bias": (("proj_in", "bias"), _np),
        "proj_out.weight": (("proj_out", "kernel"), _conv),
        "proj_out.bias": (("proj_out", "bias"), _np),
    }
    # group the u_net keys: (d|u, level, seq_index) -> {rest: value}
    groups = {}
    n_levels = 0
    for key, value in sd.items():
        if key in static:
            path, fn = static[key]
            _set(params, path, fn(value))
            continue
        m = re.fullmatch(r"u_net\.(d|u)_blocks\.(\d+)\.(\d+)\.(.+)", key)
        if not m:
            raise ValueError(f"unmapped reference image_v1 key: {key}")
        side, lvl, j = m.group(1), int(m.group(2)), int(m.group(3))
        groups.setdefault((side, lvl), {}).setdefault(j, {})[m.group(4)] = value
        if side == "d":
            n_levels = max(n_levels, lvl + 1)

    for (side, lvl), seq in groups.items():
        if side == "d":
            stack = f"u_net_d_{lvl}"
        else:
            # reference u_blocks are listed in processing order (deepest
            # first); this repo names them by level index
            stack = f"u_net_u_{n_levels - 1 - lvl}"
        layer = -1
        for j in sorted(seq):
            inner = seq[j]
            names = set(inner)
            if names == {"kernel"}:
                _check_resample_kernel(inner["kernel"], f"{side}_blocks.{lvl}.{j}")
                continue
            if any(n.startswith("main.") for n in names):
                layer += 1
                table, sub = _RES_INNER, f"res_{layer}"
            elif "qkv_proj.weight" in names:
                table, sub = _ATTN_INNER, f"attn_{layer}"
            elif "kv_proj.weight" in names:
                table, sub = _CROSS_INNER, f"cross_{layer}"
            else:
                raise ValueError(
                    f"unclassifiable u_net block {side}_blocks.{lvl}.{j}: {names}")
            for rest, value in inner.items():
                path, fn = table[rest]
                _set(params, (stack, sub) + path, fn(value))
    return params


# ---------------------------------------------------------------------------

_PORTERS = {
    "image_transformer_v2": port_image_transformer_v2,
    "image_transformer_v1": port_image_transformer_v1,
    "image_v1": port_image_v1,
}


def port_state_dict(model_type, sd):
    """Translate a reference inner-model state_dict (wrapper prefixes already
    stripped) into this repo's flax params for the given model type."""
    try:
        porter = _PORTERS[model_type]
    except KeyError:
        raise ValueError(f"unknown model type {model_type!r}") from None
    return porter(strip_prefix(sd))


def port_checkpoint(ckpt, model_type, use_ema=True):
    """Port a full reference training checkpoint dict
    (reference train.py:397-423: keys 'model' / 'model_ema')."""
    key = "model_ema" if use_ema else "model"
    sd = ckpt[key] if key in ckpt else ckpt
    return port_state_dict(model_type, sd)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", required=True, help="model config JSON")
    p.add_argument("--checkpoint", required=True, help="reference .pth checkpoint")
    p.add_argument("--output", required=True, help="output .safetensors params")
    p.add_argument("--use-ema", action="store_true", default=True)
    p.add_argument("--no-ema", dest="use_ema", action="store_false")
    args = p.parse_args(argv)

    import torch

    from k_diffusion_tpu import config as kconfig
    from k_diffusion_tpu.checkpoint import save_inference

    cfg = kconfig.load_config(args.config)
    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    params = port_checkpoint(ckpt, cfg["model"]["type"], use_ema=args.use_ema)
    save_inference(args.output, params, cfg)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
