"""End-to-end learning proof against a KNOWN-CORRECT answer.

The reference's only end-to-end quality signal is FID vs the training set
(reference train.py:371-395) — it never trains to a solution with a
closed-form optimum. For iid Gaussian pixel data x0 ~ N(mu, s^2) the EDM
machinery is exactly solvable:

  * optimal denoiser:  D*(x, sigma) = mu + s^2/(s^2 + sigma^2) * (x - mu)
    (the posterior mean of x0 given x = x0 + sigma * n);
  * minimal per-dim weighted loss under the karras (uniform) weighting:
      L*(sigma) = E[(D* - x0)^2] / c_out^2
                = s^2 (sigma^2 + sigma_data^2) / ((s^2 + sigma^2) sigma_data^2)
    using c_out^2 = sigma^2 sigma_data^2 / (sigma^2 + sigma_data^2)
    (the posterior variance s^2 sigma^2/(s^2+sigma^2) over c_out^2).

So a real training run — data -> stratified sigmas -> loss -> grads through
the shard_map dp path -> 4-group AdamW -> EMA — must drive the measured EMA
loss down to that analytic floor, and 50-step dpmpp_2m samples from the EMA
weights must reproduce the data's mean/std/decorrelation. This proves the
loop LEARNS, not merely runs (r4 verdict Missing #3).

Note mu != 0 and s != sigma_data on purpose: for s == sigma_data, mu == 0 the
EDM preconditioner makes the ZERO model optimal (model_output* == 0) and the
test would pass at initialization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k_diffusion_tpu import config as config_mod, parallel, sampling, training
from k_diffusion_tpu.models import image_transformer_v2 as itv2

MU, S, SIGMA_DATA = 0.25, 0.75, 0.5
SIGMA_MIN, SIGMA_MAX = 0.05, 10.0

CFG = config_mod.load_config({
    "model": {
        "type": "image_transformer_v2",
        "input_channels": 3,
        "input_size": [16, 16],
        "patch_size": [4, 4],
        "depths": [2],
        "widths": [64],
        "d_ffs": [128],
        "self_attns": [{"type": "global", "d_head": 32}],
        "loss_config": "karras",
        "loss_weighting": "karras",
        "dropout_rate": [0.0],
        "mapping_dropout_rate": 0.0,
        "augment_prob": 0.0,
        "sigma_data": SIGMA_DATA,
        "sigma_min": SIGMA_MIN,
        "sigma_max": SIGMA_MAX,
        "sigma_sample_density": {
            "type": "loguniform",
            "min_value": SIGMA_MIN, "max_value": SIGMA_MAX,
        },
        "mapping_width": 64,
        "mapping_d_ff": 128,
    },
    "dataset": {"type": "synthetic"},
    "optimizer": {"type": "adamw", "lr": 3e-3, "betas": [0.9, 0.95],
                  "eps": 1e-8, "weight_decay": 1e-4},
    "lr_sched": {"type": "constant", "warmup": 0.9},
    "ema_sched": {"type": "inverse", "power": 0.6667, "max_value": 0.999},
})


def analytic_floor(sigma):
    """Minimal achievable per-dim karras-weighted loss at noise level sigma."""
    s2, sd2 = S * S, SIGMA_DATA * SIGMA_DATA
    sig2 = np.square(sigma)
    return s2 * (sig2 + sd2) / ((s2 + sig2) * sd2)


def _draw_data(key, n):
    return MU + S * jax.random.normal(key, (n, 16, 16, 3))


def run_training(n_steps=400, batch=64, seed=0):
    model = config_mod.make_model(CFG)
    den_factory = config_mod.make_denoiser_wrapper(CFG)
    density = config_mod.make_sample_density(CFG["model"])
    mesh = parallel.make_mesh(jax.devices()[:8])

    key = jax.random.PRNGKey(seed)
    k_init, k_data, k_loop = jax.random.split(key, 3)
    v = model.init(k_init, jnp.zeros([1, 16, 16, 3]), jnp.ones([1]))
    opt = training.make_optimizer(CFG, itv2.param_group_labels(v["params"]))
    state = training.init_train_state(
        model, opt, k_init, {"reals": jnp.zeros([2, 16, 16, 3])})
    step = training.make_train_step(
        model, den_factory, density, opt,
        mesh=mesh, data_axis=parallel.DATA_AXIS,
        token_patch=(4, 4))

    ema_sched = config_mod.make_ema_sched(CFG)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, parallel.DATA_AXIS))
    losses = []
    with mesh:
        state = parallel.replicate(state, mesh)
        for i in range(n_steps):
            reals = _draw_data(jax.random.fold_in(k_data, i), batch)
            batch_d = {"reals": jax.device_put(reals[None], sharding)}
            state, metrics = step(state, batch_d,
                                  jax.random.fold_in(k_loop, i),
                                  ema_sched.get_value())
            ema_sched.step()
            losses.append(metrics["loss"])
            if i % 50 == 49:
                # host fence: bounds the async dispatch queue — hundreds of
                # queued 8-device collective programs can starve the CPU
                # backend's rendezvous threads on this 1-core box
                float(metrics["loss"])
    return model, den_factory, state, np.asarray(
        [float(l) for l in losses[-20:]])


def eval_ema_loss(model, den_factory, state, n=8192, seed=123):
    """Measured EMA loss on fresh draws vs the analytic floor on the SAME
    sigma draws (paired comparison removes the density-sampling variance)."""
    key = jax.random.PRNGKey(seed)
    k_sig, k_x, k_n = jax.random.split(key, 3)
    density = config_mod.make_sample_density(CFG["model"])
    sigma = density(k_sig, (n,))
    den = den_factory(
        lambda x, sg, **kw: model.apply({"params": state.ema_params}, x, sg, **kw))

    @jax.jit
    def batch_loss(sigma):
        x0 = _draw_data(k_x, n)
        noise = jax.random.normal(k_n, x0.shape)
        return jnp.mean(den.loss(x0, noise, sigma))

    measured = float(batch_loss(sigma))
    floor = float(np.mean(analytic_floor(np.asarray(sigma))))
    return measured, floor


def sample_ema(model, state, n=256, steps=50, seed=7):
    sigmas = sampling.get_sigmas_karras(steps, SIGMA_MIN, SIGMA_MAX)
    den_factory = config_mod.make_denoiser_wrapper(CFG)
    den = den_factory(
        lambda x, sg, **kw: model.apply({"params": state.ema_params}, x, sg, **kw))
    x = jax.random.normal(jax.random.PRNGKey(seed), (n, 16, 16, 3)) * SIGMA_MAX
    return np.asarray(jax.jit(
        lambda x, s: sampling.sample_dpmpp_2m(den, x, s))(x, sigmas))


@pytest.mark.slow
def test_training_reaches_analytic_floor():
    model, den_factory, state, tail_losses = run_training()
    measured, floor = eval_ema_loss(model, den_factory, state)
    # (a) the EMA loss must be within 10% of the closed-form optimum
    assert measured < 1.10 * floor, (measured, floor)
    # and genuinely above it (an impossible sub-floor loss would mean the
    # loss math, not the model, is wrong)
    assert measured > 0.97 * floor, (measured, floor)
    # the running train loss agrees (looser: it's the pre-EMA model + noise)
    assert np.mean(tail_losses) < 1.25 * floor

    # (b) 50-step dpmpp_2m samples reproduce the data distribution
    samples = sample_ema(model, state)
    flat = samples.reshape(samples.shape[0], -1)
    assert abs(flat.mean() - MU) < 0.05, flat.mean()
    assert abs(flat.std() / S - 1) < 0.08, flat.std()
    # true pixels are independent: mean |off-diagonal correlation| of the
    # sample covariance stays at the n=256 estimation-noise level (~1/sqrt n)
    sub = flat[:, :128]
    corr = np.corrcoef(sub, rowvar=False)
    off = np.abs(corr[~np.eye(corr.shape[0], dtype=bool)])
    assert off.mean() < 0.15, off.mean()


if __name__ == "__main__":
    import time

    # standalone tuning run: force the 8-virtual-device CPU mesh (the env's
    # axon plugin force-selects the TPU; env vars are too late — CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    t0 = time.time()
    model, den_factory, state, tail = run_training()
    t1 = time.time()
    measured, floor = eval_ema_loss(model, den_factory, state)
    print(f"train {t1 - t0:.1f}s; tail loss {tail.mean():.4f}; "
          f"ema loss {measured:.4f} vs floor {floor:.4f} "
          f"(ratio {measured / floor:.3f})")
    samples = sample_ema(model, state)
    flat = samples.reshape(samples.shape[0], -1)
    corr = np.corrcoef(flat[:, :128], rowvar=False)
    off = np.abs(corr[~np.eye(corr.shape[0], dtype=bool)])
    print(f"samples mean {flat.mean():.4f} (mu={MU}) std {flat.std():.4f} "
          f"(s={S}) mean|offdiag corr| {off.mean():.4f}; "
          f"sample {time.time() - t1:.1f}s")
