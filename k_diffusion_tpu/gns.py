"""Gradient noise scale (McCandlish et al., arXiv:1812.06162).

TPU-native re-design of reference k_diffusion/gns.py: the reference taps
per-rank gradients with a DDP communication hook (gns.py:5-34); here the
train step computes per-microbatch gradient sq-norms directly inside the
jitted/sharded program (the microbatch axis plays the role of the DDP rank)
and hands the two scalars to this host-side accumulator, whose estimator math
matches gns.py:37-99 exactly.
"""


class GradientNoiseScale:
    """Estimates GNS = trace(Sigma) / |G|^2 from paired (small, large) batch
    gradient sq-norms with EMA smoothing."""

    def __init__(self, beta=0.9998, eps=1e-8):
        self.beta = beta
        self.eps = eps
        self.ema_sq_norm = 0.0
        self.ema_var = 0.0
        self.beta_cumprod = 1.0
        self.gradient_noise_scale = float("nan")

    def state_dict(self):
        return dict(self.__dict__.items())

    def load_state_dict(self, state_dict):
        self.__dict__.update(state_dict)

    def update(self, sq_norm_small_batch, sq_norm_large_batch,
               n_small_batch, n_large_batch):
        """sq_norm_small_batch: mean of squared 2-norms of microbatch grads;
        sq_norm_large_batch: squared 2-norm of the mean grad."""
        if n_large_batch <= n_small_batch:
            raise ValueError(
                f"GNS needs a small batch strictly smaller than the large one "
                f"(got n_small={n_small_batch}, n_large={n_large_batch}); use "
                f"--grad-accum-steps > 1 or run data-parallel on > 1 device")
        est_sq_norm = (n_large_batch * sq_norm_large_batch
                       - n_small_batch * sq_norm_small_batch) \
            / (n_large_batch - n_small_batch)
        est_var = (sq_norm_small_batch - sq_norm_large_batch) \
            / (1 / n_small_batch - 1 / n_large_batch)
        self.ema_sq_norm = self.beta * self.ema_sq_norm + (1 - self.beta) * est_sq_norm
        self.ema_var = self.beta * self.ema_var + (1 - self.beta) * est_var
        self.beta_cumprod *= self.beta
        self.gradient_noise_scale = max(self.ema_var, self.eps) \
            / max(self.ema_sq_norm, self.eps)
        return self.gradient_noise_scale

    def get_gns(self):
        return self.gradient_noise_scale

    def get_stats(self):
        """Debiased (sq_mean, var) estimates."""
        return (self.ema_sq_norm / (1 - self.beta_cumprod),
                self.ema_var / (1 - self.beta_cumprod))
