"""Mesh extraction (ops/mesh.py): marching-tets tables from first
principles, geometry against analytic fields, welding/orientation
invariants, writer round-trips (parsed independently here, not with any
module reader), and the checkpoint->mesh CLI.

No reference analog (the reference's inference surface is image CLIs,
/root/reference/scripts/render_example.py) — oracles are analytic
fields and exhaustive case enumeration, never the module's own output.
"""

import os

import numpy as np
import jax
import pytest

from nerfmlp_tpu.config import RenderConfig
from nerfmlp_tpu.models.mlp import init_model
from nerfmlp_tpu.ops.mesh import (
    TET_CORNERS,
    TET_EDGES,
    TRI_TABLE,
    density_volume,
    extract_mesh,
    mesh_from_volume,
    save_obj,
    save_ply,
    vertex_colors,
    vertex_normals,
)


# ------------------------------------------------------------------ #
# Tables: exhaustive first-principles checks
# ------------------------------------------------------------------ #
def test_tet_table_is_exactly_the_crossing_edges():
    """For every one of the 16 inside/outside cases, the triangles must
    use exactly the set of tet edges whose endpoints straddle the
    threshold — no more, no fewer — with the correct triangle count."""
    for case in range(16):
        inside = [(case >> i) & 1 for i in range(4)]
        crossing = {
            e
            for e, (a, b) in enumerate(TET_EDGES)
            if inside[a] != inside[b]
        }
        tris = [t for t in TRI_TABLE[case] if t[0] >= 0]
        used = {int(e) for t in tris for e in t}
        n_in = sum(inside)
        if n_in in (0, 4):
            assert not tris and not crossing
        elif n_in in (1, 3):
            assert len(tris) == 1 and used == crossing and len(crossing) == 3
        else:  # 2 inside: a quad split into two triangles
            assert len(tris) == 2 and used == crossing and len(crossing) == 4
            # The two triangles share exactly one diagonal (2 edges).
            shared = set(map(int, tris[0])) & set(map(int, tris[1]))
            assert len(shared) == 2


def test_tet_decomposition_partitions_cube():
    """The 6 tets must each have volume 1/6 and tile the unit cube: a
    dense sample of cube points falls in exactly one tet (boundaries in
    at least one)."""
    corners = np.array(
        [[c & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], float
    )
    vols = []
    for tet in TET_CORNERS:
        p = corners[tet]
        vols.append(abs(np.linalg.det(p[1:] - p[0])) / 6.0)
    assert np.allclose(vols, 1.0 / 6.0)

    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.95, size=(500, 3))
    counts = np.zeros(len(pts), int)
    for tet in TET_CORNERS:
        p = corners[tet]
        # Barycentric: x = p0 + A @ lam, inside iff lam >= 0, sum <= 1.
        a = np.linalg.inv((p[1:] - p[0]).T)
        lam = (a @ (pts - p[0]).T).T
        inside = (lam > -1e-9).all(1) & (lam.sum(1) < 1 + 1e-9)
        counts += inside
    assert (counts >= 1).all()  # covers
    assert (counts <= 2).all()  # overlaps only on shared faces
    assert (counts == 1).mean() > 0.9  # interior points in exactly one


# ------------------------------------------------------------------ #
# Geometry against analytic fields
# ------------------------------------------------------------------ #
def _grid_points(g, aabb):
    lo, hi = np.asarray(aabb[:3], float), np.asarray(aabb[3:], float)
    lin = np.arange(g) / (g - 1)
    ii, jj, kk = np.meshgrid(lin, lin, lin, indexing="ij")
    return lo + np.stack([ii, jj, kk], -1) * (hi - lo)


def test_linear_field_vertices_lie_on_the_plane():
    """Edge interpolation is exact for a linear field: every extracted
    vertex of the iso-surface of f(p)=x must satisfy x == threshold."""
    g = 9
    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    vol = _grid_points(g, aabb)[..., 0].astype(np.float32)
    thr = 0.137
    verts, faces = mesh_from_volume(vol, aabb, thr)
    assert faces.shape[0] > 0
    np.testing.assert_allclose(verts[:, 0], thr, atol=1e-5)
    # The plane spans the full y/z extent of the box.
    assert verts[:, 1].min() < -0.9 and verts[:, 1].max() > 0.9


def test_sphere_mesh_is_closed_and_outward():
    g = 17
    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    pts = _grid_points(g, aabb)
    radius = 0.6
    vol = (radius - np.linalg.norm(pts, axis=-1)).astype(np.float32)
    verts, faces = mesh_from_volume(vol, aabb, 0.0)
    assert faces.shape[0] > 0
    # Vertices on the sphere to within a cell diagonal.
    cell = 2.0 / (g - 1)
    r = np.linalg.norm(verts, axis=-1)
    assert np.abs(r - radius).max() < cell * np.sqrt(3)
    # Valid indexing, no degenerate faces.
    assert faces.min() >= 0 and faces.max() < len(verts)
    assert (faces[:, 0] != faces[:, 1]).all()
    assert (faces[:, 1] != faces[:, 2]).all()
    assert (faces[:, 0] != faces[:, 2]).all()
    # Closed 2-manifold: every undirected edge borders exactly 2 faces.
    edges = np.sort(
        np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]),
        axis=1,
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    # Orientation: normals point outward (along +radial for this field).
    fn = np.cross(
        verts[faces[:, 1]] - verts[faces[:, 0]],
        verts[faces[:, 2]] - verts[faces[:, 0]],
    )
    centroid = verts[faces].mean(1)
    assert ((fn * centroid).sum(-1) > 0).all()
    # Area sanity: within 15% of the analytic sphere at this resolution.
    area = 0.5 * np.linalg.norm(fn, axis=-1).sum()
    assert abs(area - 4 * np.pi * radius**2) / (4 * np.pi * radius**2) < 0.15


def test_vertex_normals_radial_on_sphere():
    g = 17
    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    pts = _grid_points(g, aabb)
    vol = (0.6 - np.linalg.norm(pts, axis=-1)).astype(np.float32)
    verts, faces = mesh_from_volume(vol, aabb, 0.0)
    vn = vertex_normals(verts, faces)
    np.testing.assert_allclose(np.linalg.norm(vn, axis=-1), 1.0, atol=1e-6)
    radial = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    # Averaged over incident faces the agreement is tight.
    assert (vn * radial).sum(-1).min() > 0.8


def test_empty_level_sets():
    vol = np.zeros((8, 8, 8), np.float32)
    aabb = (-1, -1, -1, 1, 1, 1)
    for thr in (0.5, -0.5):  # above max / below min
        verts, faces = mesh_from_volume(vol, aabb, thr)
        assert verts.shape == (0, 3) and faces.shape == (0, 3)
    assert vertex_normals(verts, faces).shape == (0, 3)


def test_welding_dedupes_shared_vertices():
    """Adjacent cells and tets recompute shared edge points; after the
    weld the vertex count must be far below 3*T and all coordinates
    unique."""
    g = 17
    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    pts = _grid_points(g, aabb)
    vol = (0.6 - np.linalg.norm(pts, axis=-1)).astype(np.float32)
    verts, faces = mesh_from_volume(vol, aabb, 0.0)
    assert len(verts) < 0.7 * 3 * len(faces)
    assert len(np.unique(np.round(verts / 1e-7).astype(np.int64), axis=0)) \
        == len(verts)


def test_chunking_is_invisible():
    """Different cell_chunk sizes (including one forcing padding) must
    produce the identical mesh."""
    g = 9
    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    pts = _grid_points(g, aabb)
    vol = (0.5 - np.linalg.norm(pts, axis=-1)).astype(np.float32)
    v1, f1 = mesh_from_volume(vol, aabb, 0.0, chunk=7)
    v2, f2 = mesh_from_volume(vol, aabb, 0.0, chunk=100000)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(f1, f2)


# ------------------------------------------------------------------ #
# Model-facing pieces
# ------------------------------------------------------------------ #
def _tiny_cfg(**kw):
    base = dict(
        N_samples=8, N_importance=0, near=2.0, far=6.0, perturb=False,
        depth=2, width=32, aabb=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0),
    )
    base.update(kw)
    return RenderConfig(**base)


def test_density_volume_matches_direct_query():
    """Chunked+padded grid evaluation must equal one direct _query_mlp
    pass over the same nodes (same net, same constant viewdir)."""
    import jax.numpy as jnp

    from nerfmlp_tpu.ops.encoding import positional_encoding
    from nerfmlp_tpu.ops.render import _query_mlp

    cfg = _tiny_cfg()
    params = {"coarse": init_model(jax.random.PRNGKey(1), cfg.model_config())}
    g = 6
    vol = density_volume(params, cfg, resolution=g, chunk=50)  # pads: 216=4*50+16

    pts = _grid_points(g, cfg.aabb).reshape(-1, 3).astype(np.float32)
    const_dir = jnp.broadcast_to(
        jnp.array([0.0, 0.0, -1.0], jnp.float32), (pts.shape[0], 3)
    )
    dirs_enc = positional_encoding(const_dir, cfg.dir_enc_L)
    raw = _query_mlp(
        params["coarse"], jnp.asarray(pts)[:, None, :], dirs_enc, cfg
    )
    direct = np.maximum(np.asarray(raw[:, 0, 3], np.float32), 0.0)
    # Different batch shapes compile to differently-fused fp32 programs;
    # agreement is to float noise, not bit-exact.
    np.testing.assert_allclose(vol.reshape(-1), direct, atol=1e-5)


def test_vertex_colors_finite_unit_range():
    cfg = _tiny_cfg()
    params = {"coarse": init_model(jax.random.PRNGKey(2), cfg.model_config())}
    verts = np.random.default_rng(0).uniform(-1, 1, (37, 3)).astype(np.float32)
    normals = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    rgb = vertex_colors(params, cfg, verts, normals, chunk=16)
    assert rgb.shape == (37, 3)
    assert np.isfinite(rgb).all() and (rgb >= 0).all() and (rgb <= 1).all()
    # Chunking invisible here too.
    np.testing.assert_allclose(
        rgb, vertex_colors(params, cfg, verts, normals, chunk=1000), atol=1e-6
    )


def test_extract_mesh_runs_and_reports_sigma_range():
    cfg = _tiny_cfg()
    params = {"coarse": init_model(jax.random.PRNGKey(3), cfg.model_config())}
    mesh = extract_mesh(params, cfg, resolution=8, threshold=1e9, color=True)
    # Impossible threshold -> structurally valid empty mesh.
    assert mesh["verts"].shape == (0, 3) and mesh["faces"].shape == (0, 3)
    assert mesh["colors"].shape == (0, 3)
    assert mesh["sigma_max"] >= mesh["sigma_min"] >= 0.0


def test_density_volume_requires_bounds():
    cfg = _tiny_cfg(aabb=None)
    params = {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}
    with pytest.raises(ValueError, match="bounds"):
        density_volume(params, cfg, resolution=4)


# ------------------------------------------------------------------ #
# Writers — parsed independently (struct/regex), never with module code
# ------------------------------------------------------------------ #
def _sphere_mesh():
    g = 9
    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    pts = _grid_points(g, aabb)
    vol = (0.5 - np.linalg.norm(pts, axis=-1)).astype(np.float32)
    return mesh_from_volume(vol, aabb, 0.0)


def _parse_ply(path):
    with open(path, "rb") as f:
        data = f.read()
    head, _, body = data.partition(b"end_header\n")
    lines = head.decode("ascii").splitlines()
    fmt = next(l.split()[1] for l in lines if l.startswith("format"))
    n_v = int(next(l.split()[2] for l in lines if l.startswith("element vertex")))
    n_f = int(next(l.split()[2] for l in lines if l.startswith("element face")))
    props = [l.split() for l in lines if l.startswith("property ")
             and not l.startswith("property list")]
    if fmt == "ascii":
        rows = body.decode().splitlines()
        vdat = np.array([[float(x) for x in r.split()] for r in rows[:n_v]])
        fdat = np.array([[int(x) for x in r.split()[1:]] for r in rows[n_v:]])
        return vdat, fdat, [p[2] for p in props]
    dt = np.dtype([
        (f"p{i}", {"float": "<f4", "uchar": "u1"}[p[1]])
        for i, p in enumerate(props)
    ])
    vdat = np.frombuffer(body, dtype=dt, count=n_v)
    vdat = np.stack([vdat[f].astype(np.float64) for f in vdat.dtype.names], -1)
    fdt = np.dtype([("n", "u1"), ("idx", "<i4", (3,))])
    fdat = np.frombuffer(body, dtype=fdt, count=n_f,
                         offset=n_v * dt.itemsize)["idx"]
    return vdat, fdat, [p[2] for p in props]


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, binary):
    verts, faces = _sphere_mesh()
    normals = vertex_normals(verts, faces)
    colors = np.linspace(0, 1, verts.size).reshape(verts.shape)
    path = str(tmp_path / "m.ply")
    save_ply(path, verts, faces, colors=colors, normals=normals,
             binary=binary)
    vdat, fdat, names = _parse_ply(path)
    assert names == ["x", "y", "z", "nx", "ny", "nz", "red", "green", "blue"]
    np.testing.assert_allclose(vdat[:, :3], verts, atol=1e-5)
    np.testing.assert_allclose(vdat[:, 3:6], normals, atol=1e-5)
    np.testing.assert_allclose(
        vdat[:, 6:9], np.clip(colors * 255 + 0.5, 0, 255).astype(int),
        atol=0,
    )
    np.testing.assert_array_equal(fdat, faces)


def test_obj_roundtrip(tmp_path):
    verts, faces = _sphere_mesh()
    colors = np.full_like(verts, 0.25)
    path = str(tmp_path / "m.obj")
    save_obj(path, verts, faces, colors=colors)
    vs, fs = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                vs.append([float(x) for x in parts[1:]])
            elif parts[0] == "f":
                fs.append([int(x) - 1 for x in parts[1:]])
    vs, fs = np.array(vs), np.array(fs)
    np.testing.assert_allclose(vs[:, :3], verts, atol=1e-5)
    np.testing.assert_allclose(vs[:, 3:], colors, atol=1e-4)
    np.testing.assert_array_equal(fs, faces)


def test_save_mesh_rejects_unknown_extension(tmp_path):
    from nerfmlp_tpu.ops.mesh import save_mesh

    verts, faces = _sphere_mesh()
    with pytest.raises(ValueError, match="extension"):
        save_mesh(str(tmp_path / "m.stl"), {"verts": verts, "faces": faces})


# ------------------------------------------------------------------ #
# CLI end to end
# ------------------------------------------------------------------ #
def test_extract_mesh_cli(tmp_path):
    from nerfmlp_tpu.train.checkpoint import save_checkpoint
    from scripts.extract_mesh import main

    cfg = _tiny_cfg()
    params = {"coarse": init_model(jax.random.PRNGKey(4), cfg.model_config())}
    ckpt = str(tmp_path / "model_final.ckpt")
    save_checkpoint(ckpt, params)
    out = str(tmp_path / "mesh.ply")
    main([
        "--ckpt", ckpt, "--out", out,
        "--aabb", "-1", "-1", "-1", "1", "1", "1",
        "--resolution", "8", "--threshold", "0.01",
        "--netdepth", "2", "--netwidth", "32",
        "--compute_dtype", "float32", "--no_pallas",
    ])
    assert os.path.exists(out)
    vdat, fdat, _ = _parse_ply(out)
    # A random-init net may or may not cross the iso level — the contract
    # is a structurally valid PLY either way.
    assert vdat.shape[0] >= 0 and fdat.shape[0] >= 0
    if len(fdat):
        assert fdat.max() < len(vdat)


def test_density_volume_sharded_matches_single():
    """On a >1-device mesh the grid eval is row-sharded over the devices
    (replicated params, GSPMD-partitioned MLP); values must match the
    single-device eval."""
    from nerfmlp_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg()
    params = {"coarse": init_model(jax.random.PRNGKey(5), cfg.model_config())}
    single = density_volume(params, cfg, resolution=9, chunk=100)
    mesh = make_mesh(n_devices=8)
    sharded = density_volume(params, cfg, resolution=9, chunk=100, mesh=mesh)
    np.testing.assert_allclose(sharded, single, atol=2e-5)

    verts = np.random.default_rng(1).uniform(-1, 1, (23, 3)).astype(np.float32)
    normals = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    c_single = vertex_colors(params, cfg, verts, normals, chunk=16)
    c_sharded = vertex_colors(params, cfg, verts, normals, chunk=16,
                              mesh=mesh)
    np.testing.assert_allclose(c_sharded, c_single, atol=2e-5)


def test_density_volume_uses_fine_net_under_separate_fine():
    """With separate_fine, the mesh must surface the FINE net's field —
    the net that renders the final image (_final_net semantics,
    reference renderer.py:76,103) — not the coarse net's."""
    import jax.numpy as jnp

    from nerfmlp_tpu.ops.encoding import positional_encoding
    from nerfmlp_tpu.ops.render import _query_mlp

    cfg = _tiny_cfg(separate_fine=True, depth_fine=3, width_fine=48)
    params = {
        "coarse": init_model(jax.random.PRNGKey(6), cfg.model_config()),
        "fine": init_model(jax.random.PRNGKey(7),
                           cfg.model_config(fine=True)),
    }
    g = 5
    vol = density_volume(params, cfg, resolution=g)
    pts = _grid_points(g, cfg.aabb).reshape(-1, 3).astype(np.float32)
    cd = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0], jnp.float32),
                          (pts.shape[0], 3))
    enc = positional_encoding(cd, cfg.dir_enc_L)
    fine = np.maximum(np.asarray(
        _query_mlp(params["fine"], jnp.asarray(pts)[:, None, :], enc, cfg,
                   fine=True)[:, 0, 3]), 0)
    coarse = np.maximum(np.asarray(
        _query_mlp(params["coarse"], jnp.asarray(pts)[:, None, :], enc,
                   cfg)[:, 0, 3]), 0)
    np.testing.assert_allclose(vol.reshape(-1), fine, atol=1e-5)
    assert np.abs(vol.reshape(-1) - coarse).max() > 1e-3  # really distinct


def test_extract_mesh_gamma_encodes_colors():
    """gamma=True srgb-encodes the baked colors (brighter than linear
    everywhere in (0, 1)); geometry is untouched."""
    cfg = _tiny_cfg()
    params = {"coarse": init_model(jax.random.PRNGKey(8),
                                   cfg.model_config())}
    vol = density_volume(params, cfg, resolution=6)
    thr = 0.5 * (vol.min() + vol.max())
    lin = extract_mesh(params, cfg, resolution=6, threshold=thr)
    srgb = extract_mesh(params, cfg, resolution=6, threshold=thr,
                        gamma=True)
    np.testing.assert_array_equal(lin["verts"], srgb["verts"])
    if len(lin["verts"]):
        from nerfmlp_tpu.data.blender import linear_to_srgb

        np.testing.assert_allclose(
            srgb["colors"], linear_to_srgb(np.clip(lin["colors"], 0, 1)),
            atol=1e-6,
        )
        assert (srgb["colors"] >= lin["colors"] - 1e-6).all()


def test_density_volume_resolution_cap():
    """Flat node ids are int32 on device: g > 1290 must fail clearly at
    validation, not at trace time."""
    cfg = _tiny_cfg()
    params = {"coarse": init_model(jax.random.PRNGKey(0),
                                   cfg.model_config())}
    with pytest.raises(ValueError, match="1289"):
        density_volume(params, cfg, resolution=1290)


def test_sphere_mesh_signed_volume():
    """Divergence theorem on the oriented closed mesh: the signed volume
    sum(dot(v0, cross(v1, v2)))/6 must be POSITIVE (outward orientation)
    and close to (4/3) pi r^3."""
    g = 21
    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    pts = _grid_points(g, aabb)
    radius = 0.6
    vol = (radius - np.linalg.norm(pts, axis=-1)).astype(np.float32)
    verts, faces = mesh_from_volume(vol, aabb, 0.0)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    signed = np.sum(np.einsum("ij,ij->i", v0, np.cross(v1, v2))) / 6.0
    true = 4.0 / 3.0 * np.pi * radius**3
    assert signed > 0
    assert abs(signed - true) / true < 0.1


def test_two_components_topology():
    """A field with two separated blobs must surface two closed
    components: total Euler characteristic V - E + F == 4 and every edge
    still borders exactly 2 faces."""
    g = 21
    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    pts = _grid_points(g, aabb)
    d1 = 0.3 - np.linalg.norm(pts - np.array([0.45, 0, 0]), axis=-1)
    d2 = 0.3 - np.linalg.norm(pts + np.array([0.45, 0, 0]), axis=-1)
    vol = np.maximum(d1, d2).astype(np.float32)
    verts, faces = mesh_from_volume(vol, aabb, 0.0)
    edges = np.sort(
        np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]),
        axis=1,
    )
    uniq, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    euler = len(verts) - len(uniq) + len(faces)
    assert euler == 4  # two genus-0 components, chi = 2 each
