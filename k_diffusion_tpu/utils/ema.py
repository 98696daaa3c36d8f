"""EMA parameter averaging over pytrees.

Behavior parity: reference utils.py:88-104 (in-place torch lerp becomes a pure
tree_map that XLA fuses into a single elementwise pass) and utils.py:451-458.
"""

import jax


def ema_update(params, averaged_params, decay):
    """Returns ``averaged + (1 - decay) * (params - averaged)`` leafwise.

    Pure-functional counterpart of the reference's in-place
    ``averaged.lerp_(param, 1 - decay)``; call inside the jitted train step and
    donate the old average so XLA updates it in place on-device.
    """
    decay = jax.numpy.asarray(decay)

    def _lerp(avg, new):
        return avg + (1.0 - decay).astype(avg.dtype) * (new - avg)

    return jax.tree_util.tree_map(_lerp, averaged_params, params)


def ema_update_dict(values, updates, decay):
    """Host-side EMA of a dict of python floats (reference utils.py:451-458)."""
    for k, v in updates.items():
        if k not in values:
            values[k] = v
        else:
            values[k] *= decay
            values[k] += (1 - decay) * v
    return values
