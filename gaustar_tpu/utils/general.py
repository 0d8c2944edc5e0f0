"""General numeric utilities (reference: gaustar_utils/general_utils.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def get_expon_lr_func(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1000000):
    """Log-linear lr decay with optional sin-eased delay (general_utils.py:30-63).

    Returns a function of `step` usable both with python ints (host loop) and traced
    jnp arrays (inside optax schedules / jitted update steps).
    """

    def helper(step):
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(jnp.asarray(step, jnp.float32))
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(jnp.asarray(step, jnp.float32) / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(jnp.asarray(step, jnp.float32) / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(np.log(lr_init) * (1.0 - t) + np.log(lr_final) * t)
        return delay_rate * log_lerp * jnp.where(jnp.asarray(step) < 0, 0.0, 1.0)

    return helper


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """w-first (r, x, y, z) quaternion -> rotation matrix [..., 3, 3].

    Matches the (unnormalized-input) convention of forward.cu:127-146 and
    pytorch3d.transforms.quaternion_to_matrix. Input is used as-is; normalize first
    if a valid rotation is required.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> w-first quaternion [..., 4] (w >= 0 branchless).

    Uses the branch-free eigen construction (as in pytorch3d): build the four
    candidate quaternions and select the one with the largest pivot for stability.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Squared magnitudes of the 4 candidates (trace-based).
    q_abs2 = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs2, 0.0))

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs2[..., 0], m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs2[..., 1], m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs2[..., 2], m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs2[..., 3]], axis=-1),
        ],
        axis=-2,
    )  # [..., 4 candidates, 4]
    flr = 0.1
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))
    best = jnp.argmax(q_abs2, axis=-1)
    out = jnp.take_along_axis(quat_candidates, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    return out / l2norm(out)


def l2norm(
    v: jnp.ndarray, axis: int = -1, keepdims: bool = True, eps: float = 0.0
) -> jnp.ndarray:
    """sqrt(sum(v^2)). Use this instead of jnp.linalg.norm in anything jitted:
    linalg.norm's overflow-safe lowering (amax-rescaled) miscompiles under
    whole-graph jit on TPU (observed on jax 0.9.0/v5e: "unit" vectors with norms
    up to 14x off, deterministic, eager fine), which silently corrupted every
    downstream covariance. The naive form compiles correctly and our magnitudes
    (edge lengths, quaternions, view dirs) never approach f32 overflow.

    `eps` > 0 clamps the squared sum BEFORE the sqrt. This is the only
    grad-safe placement: sqrt's VJP is evaluated at the clamped (positive)
    value, so a zero vector yields gradient 0 instead of 0*inf = NaN. Clamping
    the norm after the sqrt (max(sqrt(x), eps)) still differentiates sqrt at 0
    and one exactly-degenerate face poisons every parameter with NaN through
    the mesh losses."""
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    if eps:
        sq = jnp.maximum(sq, eps * eps)
    return jnp.sqrt(sq)


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """v / max(|v|, eps), with NaN-safe gradients at v == 0 (see l2norm)."""
    return v / l2norm(v, axis=axis, eps=eps)
