"""TSDF fusion + mesh surgery + topo detection."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from gaustar_tpu.mesh import surgery, tsdf
from gaustar_tpu.mesh.primitives import icosphere
from gaustar_tpu.mesh.topology import build_topology
from gaustar_tpu.models import sugar
from gaustar_tpu.train import mesh_update, topo_detect
from gaustar_tpu.utils.general import inverse_sigmoid
from gaustar_tpu.utils.synthetic import synthetic_frame


def test_tsdf_sphere_extraction():
    """Analytic SDF -> watertight consistently-wound sphere at right radius."""
    vs = 0.05
    vol = tsdf.make_volume((-1, -1, -1), (41, 41, 41), vs, 0.15)
    ii, jj, kk = np.meshgrid(*[np.arange(41)] * 3, indexing="ij")
    pts = np.stack([ii, jj, kk], -1) * vs + np.array([-1, -1, -1])
    r = np.linalg.norm(pts, axis=-1)
    sdf = np.clip((r - 0.7) / 0.15, -1, 1)
    vol = dataclasses.replace(
        vol, tsdf=jnp.asarray(sdf.astype(np.float32)), weight=jnp.ones((41, 41, 41), jnp.float32)
    )
    v, f, _ = tsdf.extract_mesh(vol, with_color=False)
    rr = np.linalg.norm(v, axis=-1)
    assert abs(rr.mean() - 0.7) < 0.01 and rr.std() < 0.01
    topo = build_topology(f, len(v))
    assert len(topo.boundary_edges) == 0  # watertight
    sv = np.einsum("ij,ij->i", v[f[:, 0]], np.cross(v[f[:, 1]], v[f[:, 2]])).sum() / 6
    assert abs(sv - 4 / 3 * np.pi * 0.7**3) < 0.05  # consistent outward winding


def test_tsdf_integrate_from_renders():
    """Full fusion pipeline: render an opaque SuGaR sphere from ring cameras,
    TSDF-integrate, extract — surface lands near the true sphere."""
    params, config, data, target, rcfg = synthetic_frame(n_cams=8, w=64, h=64, subdiv=2)
    target = dataclasses.replace(
        target, densities=jnp.full_like(target.densities, inverse_sigmoid(0.999))
    )
    mesh = mesh_update.extract_mesh_fusion(
        target, config, data.cameras, rcfg,
        voxel_size=0.04, sdf_trunc=0.12, use_orbit_cameras=False, max_dim=64,
    )
    assert len(mesh.faces) > 50
    center = np.array([0, 0, 4.0])
    rr = np.linalg.norm(mesh.verts - center, axis=-1)
    # true radius 0.6; gaussian splat surface + coarse voxels -> loose bounds
    assert 0.4 < np.median(rr) < 0.8, np.median(rr)


def test_surgery_cut_and_connect():
    """Cut a polar cap from a sphere and reconnect a finer-tessellated cap."""
    v1, f1 = icosphere(2, radius=1.0)
    base = surgery.Mesh(v1.astype(np.float64), f1.astype(np.int64))
    v2, f2 = icosphere(3, radius=1.0)
    fusion = surgery.Mesh(v2.astype(np.float64), f2.astype(np.int64))

    # flag faces near the north pole (y > 0.8)
    centers = v1[f1].mean(axis=1)
    face_delta = (centers[:, 1] > 0.75).astype(np.float64)
    assert face_delta.sum() > 10

    out = surgery.update_mesh_topo(
        base, fusion, face_delta,
        delta_threshold=0.6, cc_face_threshold=5, outlier_face_threshold=5,
        aabb_pad=0.05, force_watertight=False,
        boundary_pad=0.3,  # toy-scale triangles (reference default 0.02 assumes mm-scale)
    )
    assert out["cc_update_num"] >= 1
    updated = out["updated_mesh"]
    assert len(updated.faces) > 0
    # tracked faces: the untouched southern hemisphere must survive
    tfm = out["track_face_mask"]
    south = centers[:, 1] < 0.0
    assert tfm[south].all()
    assert not tfm.all()  # some faces were replaced
    # surviving tracked faces are a prefix of the updated mesh with same geometry
    n_track = int(tfm.sum())
    ref_area = out["new_ref_area"]
    assert len(ref_area) == len(updated.faces)
    assert (ref_area > 0).all()
    # updated mesh still mostly spherical
    rr = np.linalg.norm(updated.verts, axis=-1)
    assert abs(np.median(rr) - 1.0) < 0.05


def test_fill_holes_triangle():
    v, f = icosphere(0)
    m = surgery.Mesh(v.astype(np.float64), f.astype(np.int64))
    m.update_faces(np.arange(len(m.faces)) != 0)  # remove one face -> 3-edge hole
    assert not m.is_watertight()
    surgery.fill_holes(m)
    assert m.is_watertight()
    sv = np.einsum(
        "ij,ij->i", m.verts[m.faces[:, 0]],
        np.cross(m.verts[m.faces[:, 1]], m.verts[m.faces[:, 2]]),
    ).sum() / 6
    assert sv > 0  # filled face winding consistent with the rest


def test_detect_topo_on_clean_scene():
    """A scene matching its GT depth should flag (almost) nothing."""
    params, config, data, target, rcfg = synthetic_frame(
        n_cams=6, w=48, h=48, subdiv=2, target_opacity=0.999
    )
    topo = build_topology(np.asarray(config.faces), len(np.asarray(target.points)))
    cfg = topo_detect.TopoDetectConfig(min_observe=2, mesh_prop=5, depth_agreement=0.1, edge_threshold=0.6)
    w = topo_detect.detect_topo_err(
        target, config, data.cameras, np.asarray(data.gt_depths), topo, rcfg, cfg
    )
    assert w.shape[0] == config.faces.shape[0]
    assert (w >= 0).all() and (w <= 1).all()
    assert (w >= 0.6).mean() < 0.2  # few false positives on a consistent scene


def test_detect_topo_flags_mismatch():
    """Shift GT depth strongly in a region -> faces there get flagged."""
    params, config, data, target, rcfg = synthetic_frame(
        n_cams=6, w=48, h=48, subdiv=2, target_opacity=0.999
    )
    topo = build_topology(np.asarray(config.faces), len(np.asarray(target.points)))
    bad_depths = np.asarray(data.gt_depths).copy()
    bad_depths[:, :, :] = np.where(bad_depths < 10, bad_depths - 0.4, bad_depths)
    cfg = topo_detect.TopoDetectConfig(min_observe=2, mesh_prop=5, detect_floor=False, depth_agreement=0.1, edge_threshold=0.6)
    w = topo_detect.detect_topo_err(
        target, config, data.cameras, bad_depths, topo, rcfg, cfg
    )
    assert (w >= 0.6).mean() > 0.3  # most faces flagged


def test_reference_mode_preset_reproduces_raw_behavior():
    """reference_mode() must equal an explicitly raw TopoDetectConfig on a
    fixture — and the preset must actually CHANGE behavior vs the improved
    defaults (VERDICT r2 item 9: parity runs can't silently inherit them)."""
    import dataclasses

    params, config, data, target, rcfg = synthetic_frame(
        n_cams=6, w=48, h=48, subdiv=2, target_opacity=0.6  # half-trained opacities
    )
    topo = build_topology(np.asarray(config.faces), len(np.asarray(target.points)))
    kw = dict(min_observe=2, mesh_prop=5, detect_floor=False,
              depth_agreement=0.1, edge_threshold=0.6)

    preset = topo_detect.reference_mode(**kw)
    assert preset.composite_over_surface is False
    assert preset.solid_opacity is None
    assert preset.bilinear_query is False
    assert preset.agreement_px == 0.0 and preset.agreement_edge == 0.0  # raw fixed gate
    assert preset.aggregate == "mean"  # raw equal mean

    explicit = topo_detect.TopoDetectConfig(
        composite_over_surface=False, solid_opacity=None, bilinear_query=False,
        agreement_px=0.0, agreement_edge=0.0, aggregate="mean", **kw
    )
    w_preset = topo_detect.detect_topo_err(
        target, config, data.cameras, np.asarray(data.gt_depths), topo, rcfg, preset
    )
    w_explicit = topo_detect.detect_topo_err(
        target, config, data.cameras, np.asarray(data.gt_depths), topo, rcfg, explicit
    )
    np.testing.assert_allclose(w_preset, w_explicit)

    # as_reference_mode() on a default config gives the same preset.
    assert topo_detect.TopoDetectConfig(**kw).as_reference_mode() == preset

    # With HALF-TRAINED opacities the improved defaults differ from raw
    # (that's their whole point — see TopoDetectConfig docstrings).
    w_default = topo_detect.detect_topo_err(
        target, config, data.cameras, np.asarray(data.gt_depths), topo, rcfg,
        topo_detect.TopoDetectConfig(**kw),
    )
    assert not np.allclose(w_default, w_preset)
