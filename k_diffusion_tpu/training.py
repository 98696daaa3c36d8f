"""Training infrastructure: optimizer factory, train state, and the jitted
data-parallel train step.

TPU-native re-design of the reference's train loop body (train.py:434-519):
the whole step — class-cond dropout, stratified sigma sampling, noising,
loss, gradient (with microbatch accumulation as a lax.scan), global-norm
clip, optimizer update, and EMA — is ONE pure jitted function over a device
mesh. Gradient averaging across devices is inserted by XLA from the batch
sharding (replacing DDP bucketed all-reduce, train.py:241,459); loss
reporting is a global mean (replacing accelerator.gather().mean(),
train.py:457); stratified sigma strata are assigned globally across
(accum step x global batch index), subsuming the reference's rank x accum
stratification (utils.py:296-320, train.py:453-454).
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from . import config as config_mod
from .utils import ema_update


class TrainState(flax.struct.PyTreeNode):
    step: Any
    params: Any
    opt_state: Any
    ema_params: Any


def make_optimizer(config, param_labels, mapping_lr_scale=1 / 3, max_grad_norm=1.0,
                   flat=None):
    """Builds the 4-group optimizer {wd, no_wd} x {base lr, mapping lr}
    (reference image_transformer_v2.py:708-719, train.py:153-175) with
    global-norm clipping fused into the update (train.py:464).

    ``flat``: use the flat-vector AdamW (flatopt.py) instead of the per-leaf
    optax chain — same update, ~5x fewer device ops. Default: on for adamw
    (the per-leaf chain remains as the equivalence oracle and the path for
    adam8bit / sgd)."""
    opt_config = config["optimizer"]
    lr_sched = config_mod.make_lr_schedule(config)

    if flat is None:
        flat = opt_config["type"] == "adamw"
    if flat and opt_config["type"] == "adamw":
        from .flatopt import flat_adamw
        wd = opt_config["weight_decay"]
        return flat_adamw(
            lr_sched,
            {"wd": (1.0, wd), "no_wd": (1.0, 0.0),
             "mapping_wd": (mapping_lr_scale, wd),
             "mapping_no_wd": (mapping_lr_scale, 0.0)},
            param_labels, b1=opt_config["betas"][0], b2=opt_config["betas"][1],
            eps=opt_config["eps"], max_grad_norm=max_grad_norm)

    def group(lr_scale, weight_decay):
        sched = lambda step: lr_sched(step) * lr_scale
        if opt_config["type"] == "adamw":
            return optax.adamw(
                sched, b1=opt_config["betas"][0], b2=opt_config["betas"][1],
                eps=opt_config["eps"], weight_decay=weight_decay)
        if opt_config["type"] == "adam8bit":
            # bitsandbytes Adam8bit analog: blockwise int8 moment state
            from .optim8bit import adamw8bit
            return adamw8bit(
                sched, b1=opt_config["betas"][0], b2=opt_config["betas"][1],
                eps=opt_config["eps"], weight_decay=weight_decay)
        if opt_config["type"] == "sgd":
            tx = optax.sgd(sched, momentum=opt_config.get("momentum", 0.0),
                           nesterov=opt_config.get("nesterov", False))
            if weight_decay:
                tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
            return tx
        raise ValueError("Invalid optimizer type")

    wd = opt_config["weight_decay"]
    transforms = {
        "wd": group(1.0, wd),
        "no_wd": group(1.0, 0.0),
        "mapping_wd": group(mapping_lr_scale, wd),
        "mapping_no_wd": group(mapping_lr_scale, 0.0),
    }
    tx = optax.multi_transform(transforms, param_labels)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


def _global_sq_norm(tree):
    return sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
               for g in jax.tree_util.tree_leaves(tree))


def make_train_step(model, denoiser_factory, sample_density, optimizer, *,
                    num_classes=0, cond_dropout_rate=0.0, stratified=True,
                    compute_gns=False, has_mapping_cond=False, apply_fn=None,
                    mesh=None, data_axis="data", watch_labels=None,
                    token_patch=None):
    """Returns ``step(state, batch, key, ema_decay) -> (state, metrics)``,
    jitted with the state donated (in-place on-device update).

    ``batch`` is a dict with leading dims [accum, global_batch]:
      reals (A, B, H, W, C); optional class_cond (A, B) int;
      optional aug_cond (A, B, 9); optional mapping_cond (A, B, D).

    ``apply_fn(params, x, sigma, dropout_key, **extra)`` overrides the
    default flax apply (used e.g. to pack aug_cond into mapping_cond for
    image_v1's augment wrapper, reference augmentation.py:92-114).

    ``mesh``: when set, the per-microbatch gradient runs under ``shard_map``
    over ``data_axis`` with an explicit ``pmean`` (the XLA analog of DDP's
    bucketed all-reduce, reference train.py:241). This is the path REAL
    data-parallel meshes must take: inside shard_map every array is the
    per-device shard, so the Pallas attention kernels (which GSPMD cannot
    partition) see local shapes. Results are BIT-IDENTICAL to the
    single-device step when model dropout is 0: the noise and class-dropout
    draws are generated at the global batch shape and sliced per shard
    (model dropout masks are per-shard ``fold_in``s — decorrelated, like
    the reference's per-rank RNG). With compute_gns, each device's
    pre-pmean gradient sq-norm is also reported — the analog of the
    reference's per-rank DDP hook (reference gns.py:5-34) — making the
    per-device batch the small-batch GNS signal. Only the data axis goes
    manual: a tensor-parallel 'model' axis stays automatic, so in-model
    sharding constraints over it still apply inside the body.
    """

    if apply_fn is None:
        def apply_fn(params, x, sig, dropout_key, **kwargs):
            return model.apply({"params": params}, x, sig, train=True,
                               rngs={"dropout": dropout_key}, **kwargs)

    def microbatch_loss(params, mb, sigma, key, shard=None):
        """``shard``: (index, count) under shard_map — RNG draws tied to the
        GLOBAL batch are generated at global shape and sliced, so the math
        is layout-invariant."""
        k_noise, k_drop, k_dropout = jax.random.split(key, 3)
        reals = mb["reals"]
        b_local = reals.shape[0]

        def global_draw(draw_fn, local_shape, dtype=None):
            if shard is None:
                return draw_fn(local_shape)
            idx, count = shard
            full = draw_fn((b_local * count,) + tuple(local_shape[1:]))
            return jax.lax.dynamic_slice_in_dim(full, idx * b_local, b_local)

        extra = {}
        if "class_cond" in mb:
            cls = mb["class_cond"]
            if cond_dropout_rate > 0:
                u = global_draw(
                    lambda s: jax.random.uniform(k_drop, s), cls.shape)
                cls = jnp.where(u < cond_dropout_rate,
                                jnp.full_like(cls, num_classes), cls)
            extra["class_cond"] = cls
        if "aug_cond" in mb:
            extra["aug_cond"] = mb["aug_cond"]
        if has_mapping_cond and "mapping_cond" in mb:
            extra["mapping_cond"] = mb["mapping_cond"]

        if shard is not None:  # decorrelate model-dropout masks per shard
            k_dropout = jax.random.fold_in(k_dropout, shard[0])

        def inner(x, sig, **kwargs):
            return apply_fn(params, x, sig, k_dropout, **kwargs)

        den = denoiser_factory(inner)
        if reals.ndim == 4 and getattr(den, "scales", 1) == 1:
            from . import layout
            if token_patch is not None:
                # token layout (b, h/ph, w/pw, ph*pw*c): both patch
                # boundaries inside the step become plain matmuls — the
                # pixel gather happens once here, outside the model, and
                # reals carry no gradient so the backward never pays it
                # (measured +1% train, +6% sampling; layout.py)
                def inner_tok(x, sig, **kwargs):
                    return apply_fn(params, x, sig, k_dropout,
                                    image_layout="tokens", **kwargs)
                den = denoiser_factory(inner_tok)
                reals = layout.to_tokens(reals, token_patch)
            else:
                # folded (b, h, w*c) image layout for the loss-side
                # elementwise math (layout.py): bitwise-identical loss (the
                # noise draw reshapes in place, threefry bits are
                # flat-indexed), avoids XLA's C-minor image layout for
                # every loss op and its backward
                den = denoiser_factory(
                    layout.folded_model_fn(inner, reals.shape[-1]))
                reals = layout.fold_images(reals)
        noise = global_draw(
            lambda s: jax.random.normal(k_noise, s, reals.dtype), reals.shape)
        losses = den.loss(reals, noise, sigma, **extra)
        return jnp.mean(losses)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        n_shards = mesh.shape[data_axis]

        def grad_microbatch(params, mb, sigma, key):
            """Per-device grads (+ pre-psum sq-norm), then pmean back."""
            def body(params, mb, sigma, key):
                shard = (jax.lax.axis_index(data_axis), n_shards)
                loss, grads = jax.value_and_grad(microbatch_loss)(
                    params, mb, sigma, key, shard)
                sqn = (_global_sq_norm(grads) if compute_gns
                       else jnp.float32(0))
                return (jax.lax.pmean(loss, data_axis),
                        jax.lax.pmean(grads, data_axis),
                        jax.lax.pmean(sqn, data_axis))

            return shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(data_axis), P(data_axis), P()),
                out_specs=(P(), P(), P()), check_vma=False,
                axis_names=frozenset({data_axis}),
            )(params, mb, sigma, key)
    else:
        def grad_microbatch(params, mb, sigma, key):
            loss, grads = jax.value_and_grad(microbatch_loss)(
                params, mb, sigma, key)
            sqn = _global_sq_norm(grads) if compute_gns else jnp.float32(0)
            return loss, grads, sqn

    def step_fn(state, batch, key, ema_decay):
        a_steps = batch["reals"].shape[0]
        b = batch["reals"].shape[1]

        k_sigma, k_loop = jax.random.split(key)
        sigma_flat = sample_density(
            k_sigma, (a_steps * b,), stratified=(0, 1) if stratified else None)
        sigmas = sigma_flat.reshape(a_steps, b)

        if a_steps == 1:
            # no-accumulation fast path: the scan below would zero-init and
            # add a full f32 grads tree (~3 extra HBM passes over the params
            # at 61M+); with one microbatch the sum is the identity, so this
            # is bit-identical (0 + g == g and g / 1 == g in f32)
            mb = jax.tree_util.tree_map(lambda x: x[0], batch)
            loss, grads, sqn_small = grad_microbatch(
                state.params, mb, sigmas[0], jax.random.fold_in(k_loop, 0))
        else:
            def accum_body(carry, inp):
                grads_acc, loss_acc, sqn_acc = carry
                mb, sigma, idx = inp
                k = jax.random.fold_in(k_loop, idx)
                loss, grads, sqn = grad_microbatch(state.params, mb, sigma, k)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss, sqn_acc + sqn), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (grads, loss, sqn_small), _ = jax.lax.scan(
                accum_body, (zeros, jnp.float32(0), jnp.float32(0)),
                (batch, sigmas, jnp.arange(a_steps)))
            grads = jax.tree_util.tree_map(lambda g: g / a_steps, grads)
            loss = loss / a_steps
        metrics = {"loss": loss}
        if compute_gns:
            metrics["grad_sq_norm_small"] = sqn_small / a_steps
            metrics["grad_sq_norm_big"] = _global_sq_norm(grads)
        if watch_labels is not None:
            # wandb.watch analog (reference train.py:253-254): per-group
            # param/grad norm summaries, computed on device and logged at the
            # wandb cadence by the caller
            label_leaves = jax.tree_util.tree_leaves(watch_labels)
            param_leaves = jax.tree_util.tree_leaves(state.params)
            grad_leaves = jax.tree_util.tree_leaves(grads)
            for name in sorted(set(label_leaves)):
                ps = [p for l, p in zip(label_leaves, param_leaves) if l == name]
                gs = [g for l, g in zip(label_leaves, grad_leaves) if l == name]
                metrics[f"param_norm/{name}"] = jnp.sqrt(_global_sq_norm(ps))
                metrics[f"grad_norm/{name}"] = jnp.sqrt(_global_sq_norm(gs))

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(params, state.ema_params, ema_decay)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_params)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def init_train_state(model, optimizer, key, example_batch, **model_kwargs):
    """Initializes params/opt/EMA. ``example_batch`` is a dict like the train
    batch without the accum dim."""
    reals = example_batch["reals"]
    sigma = jnp.ones([reals.shape[0]], reals.dtype)
    kwargs = {}
    if "class_cond" in example_batch:
        kwargs["class_cond"] = example_batch["class_cond"]
    if "aug_cond" in example_batch:
        kwargs["aug_cond"] = example_batch["aug_cond"]
    if "mapping_cond" in example_batch:
        kwargs["mapping_cond"] = example_batch["mapping_cond"]
    kwargs.update(model_kwargs)
    variables = model.init(key, reals, sigma, **kwargs)
    params = variables["params"]
    opt_state = optimizer.init(params)
    # distinct buffers for the EMA copy: params and ema_params must not alias
    # (the train step donates the whole state)
    ema_params = jax.tree_util.tree_map(jnp.copy, params)
    return TrainState(step=jnp.int32(0), params=params, opt_state=opt_state,
                      ema_params=ema_params)
