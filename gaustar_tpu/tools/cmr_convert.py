"""Camera/dataset conversion — gaustar_tools/cmr_convert.py equivalents.

COLMAP text export (cameras.txt / images.txt with cx, cy FORCED to the image
center, cmr_convert.py:16-61 — the dataset images are shifted to match), image
principal-point recentering, and the ActorsHQ converter's camera packing
(data_process/ahq2gaustar.py:13-47).
"""

from __future__ import annotations

import os

import numpy as np


def rotmat2qvec(R):
    """Rotation matrix -> COLMAP (w, x, y, z) quaternion (cmr_convert.py:31-42)."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = (
        np.array(
            [
                [Rxx - Ryy - Rzz, 0, 0, 0],
                [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
                [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
                [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


def write_cameras_text(intr, shape, path):
    """COLMAP cameras.txt, PINHOLE with centered principal point
    (cmr_convert.py:16-28)."""
    n = intr.shape[0]
    header = (
        "# Camera list with one line of data per camera:\n"
        "#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[fx,fy,cx,cy]\n"
        f"# Number of cameras: {n}\n"
    )
    with open(path, "w") as f:
        f.write(header)
        for i in range(n):
            row = [
                i, "PINHOLE", shape[i, 1], shape[i, 0],
                intr[i][0, 0], intr[i][1, 1], shape[i, 1] * 0.5, shape[i, 0] * 0.5,
            ]
            f.write(" ".join(str(x) for x in row) + "\n")


def write_images_text(extrinsics, path):
    """COLMAP images.txt from w2c extrinsics (cmr_convert.py:45-61)."""
    n = extrinsics.shape[0]
    header = (
        "# Image list with two lines of data per image:\n"
        "#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n"
        "#   POINTS2D[] as (X, Y, POINT3D_ID)\n"
        f"# Number of images: {n}, mean observations per image: 0\n"
    )
    with open(path, "w") as f:
        f.write(header)
        for i in range(n):
            e = extrinsics[i]
            q = rotmat2qvec(e[0:3, 0:3])
            t = e[0:3, 3]
            f.write(" ".join(map(str, [i, *q, *t, i, f"img_{i:04d}.jpg"])) + "\n")


def export_colmap(path, intr, extr, shape):
    """Write sparse/0/{cameras,images}.txt (cmr_convert.py:64-68)."""
    colmap_dir = os.path.join(path, "sparse", "0")
    os.makedirs(colmap_dir, exist_ok=True)
    write_cameras_text(intr, shape, os.path.join(colmap_dir, "cameras.txt"))
    write_images_text(extr, os.path.join(colmap_dir, "images.txt"))


def recenter_image(img, intr_mat, border_value=None):
    """Shift an image so the principal point lands at the center
    (cmr_convert.py:102-112, ahq2gaustar.py:50-81)."""
    import cv2

    shape = img.shape[:2]
    dx = intr_mat[0, 2] - 0.5 * shape[1]
    dy = intr_mat[1, 2] - 0.5 * shape[0]
    trans = np.float32([[1, 0, -dx], [0, 1, -dy]])
    kw = {"borderValue": border_value} if border_value is not None else {}
    return cv2.warpAffine(img, trans, shape[::-1], **kw)


def read_actorshq_calibration(csv_path: str):
    """Parse an ActorsHQ calibration.csv into rgb_cameras.npz arrays
    (ahq2gaustar.py:13-47): per-camera name, rotation (Rodrigues axis-angle),
    translation, focal/principal in NORMALIZED units, image size."""
    import csv as csv_mod
    import cv2

    intr_list, extr_list, shape_list = [], [], []
    with open(csv_path) as f:
        for row in csv_mod.DictReader(f):
            w, h = int(row["w"]), int(row["h"])
            fx = float(row["fx"]) * w
            fy = float(row["fy"]) * h
            cx = float(row["px"]) * w
            cy = float(row["py"]) * h
            rvec = np.array([float(row["rx"]), float(row["ry"]), float(row["rz"])])
            R, _ = cv2.Rodrigues(rvec)
            t = np.array([float(row["tx"]), float(row["ty"]), float(row["tz"])])
            # ActorsHQ stores camera-to-world; GauSTAR wants world-to-camera.
            w2c = np.eye(4)
            w2c[:3, :3] = R.T
            w2c[:3, 3] = -R.T @ t
            intr = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
            intr_list.append(intr)
            extr_list.append(w2c)
            shape_list.append([h, w])
    return {
        "intrinsics": np.asarray(intr_list),
        "extrinsics": np.asarray(extr_list),
        "shape": np.asarray(shape_list, np.int64),
    }


def save_rgb_cameras(path: str, cmr: dict):
    np.savez(path, **cmr)


def color_mesh_from_views(
    verts, faces, images, depths, cmr, depth_agreement=0.01, min_views=1
):
    """Initial colored mesh by multi-view vertex-color voting with depth
    visibility (ahq2gaustar.py:124-160): each vertex averages the image color of
    every camera that sees it (projected depth agrees with the GT depth map).
    images [C, H, W, 3] in [0, 1]; depths [C, H, W]; cmr: rgb_cameras arrays.
    Returns vertex_colors [V, 3]."""
    from gaustar_tpu.tools.geometry import project, query_at_image

    verts = np.asarray(verts, np.float64)
    acc = np.zeros((len(verts), 3))
    cnt = np.zeros(len(verts))
    for ci in range(len(images)):
        shape = depths[ci].shape
        pix, local = project(verts, cmr["intrinsics"][ci], cmr["extrinsics"][ci], shape, return_local_points=True)
        d, ok = query_at_image(depths[ci], pix, return_valid=True)
        vis = ok & (np.abs(local[..., 2] - d) < depth_agreement)
        col = query_at_image(images[ci], pix)
        acc[vis] += col[vis]
        cnt[vis] += 1
    colors = np.full((len(verts), 3), 0.5)
    seen = cnt >= min_views
    colors[seen] = acc[seen] / cnt[seen, None]
    return colors
