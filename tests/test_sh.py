import jax.numpy as jnp
import numpy as np

from gaustar_tpu.ops import sh


def test_deg0_is_constant():
    coeffs = np.zeros((5, 9, 3), np.float32)
    coeffs[:, 0, :] = 1.0
    dirs = np.random.default_rng(0).normal(size=(5, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh.eval_sh(0, jnp.asarray(coeffs), jnp.asarray(dirs))
    np.testing.assert_allclose(out, sh.C0, rtol=1e-6)


def test_rgb_sh_roundtrip():
    rgb = np.random.default_rng(1).uniform(size=(10, 3)).astype(np.float32)
    back = sh.sh_to_rgb_dc(sh.rgb_to_sh(jnp.asarray(rgb)))
    np.testing.assert_allclose(back, rgb, rtol=1e-5, atol=1e-6)


def test_sh_to_rgb_clamps_negative():
    coeffs = np.zeros((1, 9, 3), np.float32)
    coeffs[:, 0, :] = -10.0  # strongly negative dc -> clamped to 0
    pos = jnp.asarray([[1.0, 0.0, 0.0]])
    campos = jnp.zeros(3)
    out = sh.sh_to_rgb(2, jnp.asarray(coeffs), pos, campos)
    assert (out == 0.0).all()


def test_deg1_matches_manual():
    rng = np.random.default_rng(2)
    coeffs = rng.normal(size=(4, 4, 1)).astype(np.float32)
    dirs = rng.normal(size=(4, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    expect = (
        sh.C0 * coeffs[:, 0, 0]
        - sh.C1 * y * coeffs[:, 1, 0]
        + sh.C1 * z * coeffs[:, 2, 0]
        - sh.C1 * x * coeffs[:, 3, 0]
    )
    out = sh.eval_sh(1, jnp.asarray(coeffs), jnp.asarray(dirs))[:, 0]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_eval_sh_soa_matches_eval_sh_all_degrees():
    rng = np.random.default_rng(3)
    n, c = 257, 3
    coeffs = rng.normal(size=(n, 25, c)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    x, y, z = (jnp.asarray(dirs[:, i]) for i in range(3))
    sh_t = jnp.asarray(coeffs).transpose(1, 2, 0)
    for deg in range(5):
        k = (deg + 1) ** 2
        ref = sh.eval_sh(deg, jnp.asarray(coeffs[:, :k]), jnp.asarray(dirs))
        got = sh.eval_sh_soa(deg, sh_t[:k], x, y, z)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_banded_matches_static_truncation_values_and_grads():
    """sh_to_rgb_banded with 0/1 degree weights == sh_to_rgb at the static
    degree — values AND gradients (the traced-SH-warmup correctness claim)."""
    import jax

    rng = np.random.default_rng(4)
    n, levels = 129, 3
    coeffs = rng.normal(size=(n, levels**2, 3)).astype(np.float32)
    positions = rng.normal(size=(n, 3)).astype(np.float32) + np.array([0, 0, 4], np.float32)
    campos = jnp.zeros(3, jnp.float32)

    for deg in range(levels):
        k = (deg + 1) ** 2

        def f_static(c):
            return sh.sh_to_rgb(deg, c[:, :k], jnp.asarray(positions), campos).sum()

        def f_banded(c):
            w = sh.warmup_degree_weights(jnp.int32(deg), levels)
            return sh.sh_to_rgb_banded(c, jnp.asarray(positions), campos, w).sum()

        c = jnp.asarray(coeffs)
        v0, g0 = jax.value_and_grad(f_static)(c)
        v1, g1 = jax.value_and_grad(f_banded)(c)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5, atol=1e-6)
        # masked bands must receive exactly zero gradient
        assert np.all(np.asarray(g1)[:, k:] == 0.0)
