"""ops/segment.py: static segment-sum gather VJP vs XLA's scatter-add VJP."""

import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.ops import segment


def test_gather_rows_value_and_grad_parity():
    rng = np.random.default_rng(0)
    n, m, c = 57, 301, 3
    src = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    # Duplicates, unreferenced rows (0 and n-1 excluded), arbitrary order.
    idx_np = rng.integers(1, n - 1, size=m).astype(np.int32)
    idx = jnp.asarray(idx_np)
    tables = segment.gather_tables(idx_np, n)
    ct = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)

    def f_plain(s):
        return (segment.gather_rows(s, idx) * ct).sum()

    def f_tab(s):
        return (segment.gather_rows(s, idx, tables) * ct).sum()

    v0, g0 = jax.value_and_grad(f_plain)(src)
    v1, g1 = jax.value_and_grad(f_tab)(src)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5, atol=1e-6)
    # Unreferenced rows get exactly zero gradient.
    assert np.all(np.asarray(g1)[0] == 0.0)
    assert np.all(np.asarray(g1)[n - 1] == 0.0)


def test_gather_rows_through_mesh_losses():
    """shared_losses path: tables on vs off give identical loss + gradients."""
    from gaustar_tpu.mesh.primitives import uv_sphere
    from gaustar_tpu.mesh.topology import build_topology
    from gaustar_tpu.ops import losses

    verts_np, faces_np = uv_sphere(9, 12, radius=0.5, center=(0.0, 0.0, 2.0))
    topo = build_topology(np.asarray(faces_np), len(verts_np))
    verts = jnp.asarray(verts_np)
    faces = jnp.asarray(faces_np)
    adj = jnp.asarray(topo.adj_faces)
    ft = segment.gather_tables(np.asarray(faces_np), len(verts_np))
    at = segment.gather_tables(np.asarray(topo.adj_faces), len(faces_np))
    ref_area, _ = losses.face_areas_normals(verts, faces)

    def total(v, tables, adj_tables):
        return (
            losses.mesh_normal_consistency_loss(v, faces, adj, tables, adj_tables)
            + losses.mesh_area_isometry_loss(v, faces, ref_area * 0.9, tables)
        )

    v0, g0 = jax.value_and_grad(lambda v: total(v, None, None))(verts)
    v1, g1 = jax.value_and_grad(lambda v: total(v, ft, at))(verts)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5, atol=1e-6)
