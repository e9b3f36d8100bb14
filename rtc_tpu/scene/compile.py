"""Scene compiler: builder tree -> SoA device slabs.

This is where the reference's per-ray work is hoisted to scene-build time:

  * group transforms are already pushed into leaves by the builder
    (reference: src/shape.rs:207-218 does the same push-down);
  * every inverse and inverse-transpose is precomputed ONCE in float64 on the
    host (the reference recomputes the inverse per intersection call —
    src/shape.rs:249-253 — despite its cached field);
  * triangle vertices are baked into world space, so mesh intersection needs
    no per-ray transform at all (valid because t is invariant under the
    object-to-world map when the direction is not renormalized —
    src/ray.rs:19-24);
  * the two-level pattern transform chain (src/pattern.rs:98-103) is
    precomposed into a single affine per object.

The result is a pytree of arrays (`Scene`) plus hashable static metadata
(`SceneStatic`) so the whole scene can be a jit argument.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import patterns as pattern_ops
from .shapes import KIND_CODES, Shape, triangle_edges
from .world import World

# Infinite cylinder/cone extents are clamped to +-Y_INF so f32 arithmetic on
# the params stays finite. No scene approaches this scale.
Y_INF = 1e9

# clusters per supercluster in the mesh-acceleration hierarchy
SUPER_WIDTH = 8


class SceneStatic(NamedTuple):
    """Hashable compile-time facts used to prune the traced graph."""

    n_prims: int
    n_tris: int
    n_objects: int
    refr_prim_ids: Tuple[int, ...]  # analytic prims with ior != 1 or transparency > 0
    any_reflective: bool
    any_refractive: bool
    any_pattern: bool
    n_clusters: int = 0       # triangle clusters for the 2-level Pallas path
    cluster_size: int = 0     # triangles per cluster (tris padded to C*L)
    any_smooth: bool = False  # any mesh carries per-corner (smooth) normals
    n_super: int = 0          # superclusters (groups of SUPER_WIDTH clusters)
    # mesh/triangle objects that act as refractive containers (ior != 1 or
    # transparency > 0); their triangle slabs live in Scene.refr_tri_* for
    # the n1/n2 parity walk
    refr_mesh_obj_ids: Tuple[int, ...] = ()
    # object id shared by EVERY triangle (-1 when there are several triangle
    # objects): lets the integrator replace the 1.8M-row tri_obj gather
    # (~19 ms/sweep on v5 lite) with a constant for single-mesh scenes
    single_tri_obj: int = -1
    # instanced (TLAS) mesh acceleration: built when many mesh leaves share
    # object-space geometry and the world-baked table would overflow the
    # kernel's VMEM budget but the UNIQUE geometry fits. n_inst == 0 means
    # no TLAS (Scene.tlas is None). tlas_cm = clusters per unique mesh
    # (every mesh padded to the same count), so instance-local winner ids
    # are enc = inst * (tlas_cm * cluster_size) + local.
    tlas_n_inst: int = 0
    tlas_n_mesh: int = 0
    tlas_cm: int = 0
    # smooth instanced meshes: TlasTables.sn carries (Tu, 9) object-space
    # corner normals and the TLAS kernel blends them in-kernel (with_sn)
    tlas_sn: bool = False


class TlasTables(NamedTuple):
    """Instanced two-level acceleration tables (all meshes in OBJECT space).

    The reference renders 'herds' by re-walking one shape tree per ray per
    group (src/shape.rs:399-436); flattening that to world space replicates
    geometry per instance. The TPU-native alternative keeps the unique
    geometry VMEM-resident ONCE and transforms each ray tile into instance
    space inside the kernel (t is preserved because directions are not
    renormalized — the same invariant the reference relies on,
    src/shape.rs:214-221)."""

    p1: jnp.ndarray        # (Tu, 3) unique meshes concatenated, obj space
    e1: jnp.ndarray        # (Tu, 3)
    e2: jnp.ndarray        # (Tu, 3)
    n: jnp.ndarray         # (Tu, 3) unit OBJECT-space face normals
    caabb: jnp.ndarray     # (M * Cm, 6) object-space cluster AABBs
    inst_ab: jnp.ndarray   # (I, 12) f32 world->object [A row-major | b]
    # per-instance ray-FEATURE transform (I*16, 10): rayf' = rayf @ M pushes
    # the kernel's [d, o x d, o, 1] feature rows into instance object space
    # in ONE (rt, 10) x (10, 10) matmul. The cross-product block uses the
    # cofactor identity (Ao) x (Ad) = cof(A) (o x d); 16-row stride so the
    # kernel's dynamic sublane slice is 8-aligned.
    inst_rf: jnp.ndarray
    inst_aabb: jnp.ndarray  # (I, 6) world AABB per instance (padding: empty)
    inst_obj: jnp.ndarray  # (I,) i32 object id per instance
    inst_mesh: jnp.ndarray  # (I,) i32 unique-mesh index per instance
    gid: jnp.ndarray       # (I, Cm * leaf) i32 -> world-table row (pad 0)
    # (Tu, 9) OBJECT-space corner normals [sn1|sn2|sn3] for smooth
    # instanced meshes ((0, 9) when static.tlas_sn is False); flat meshes
    # in a mixed scene replicate the face normal so the blend is a no-op
    sn: jnp.ndarray = None


@dataclasses.dataclass
class Scene:
    """SoA scene. N analytic prims, T triangles, O objects (N + mesh leaves)."""

    # analytic primitives
    prim_kind: jnp.ndarray   # (N,) i32: 0 sphere 1 plane 2 cube 3 cylinder 4 cone
    prim_inv: jnp.ndarray    # (N, 3, 4) world->object affine
    prim_invT: jnp.ndarray   # (N, 3, 3) inverse-transpose linear part
    prim_params: jnp.ndarray  # (N, 3): ymin, ymax, capped
    prim_obj: jnp.ndarray    # (N,) i32 object ids

    # triangles (baked to world space)
    tri_p1: jnp.ndarray      # (T, 3)
    tri_e1: jnp.ndarray      # (T, 3)
    tri_e2: jnp.ndarray      # (T, 3)
    tri_n: jnp.ndarray       # (T, 3) unit world normals (flat/face)
    tri_obj: jnp.ndarray     # (T,) i32 object ids
    # per-triangle container slot for the n1/n2 census: index into
    # static.refr_mesh_obj_ids, -1 = not a container triangle. Static per
    # scene, precomputed here so the crossing-count kernel wrapper never
    # rebuilds it per bounce node (it used to cost O(K*T) jnp.where work
    # per transparent sweep).
    tri_cid: jnp.ndarray     # (T,) i32
    # per-corner smooth normals ((0,3) when the scene has none); rows of
    # flat-shaded meshes carry the face normal so interpolation is a no-op
    tri_sn1: jnp.ndarray     # (T, 3)
    tri_sn2: jnp.ndarray     # (T, 3)
    tri_sn3: jnp.ndarray     # (T, 3)

    # per-object material table (reference: src/material.rs:3-29)
    mat_color: jnp.ndarray        # (O, 3)
    mat_ambient: jnp.ndarray      # (O,)
    mat_diffuse: jnp.ndarray      # (O,)
    mat_specular: jnp.ndarray     # (O,)
    mat_shininess: jnp.ndarray    # (O,)
    mat_reflective: jnp.ndarray   # (O,)
    mat_transparency: jnp.ndarray  # (O,)
    mat_ior: jnp.ndarray          # (O,)

    # per-object pattern table; kind NONE rows carry the material color in
    # pat_a so pattern evaluation doubles as the pattern-or-color select
    # (reference: src/material.rs:42-46)
    pat_kind: jnp.ndarray    # (O,) i32
    pat_a: jnp.ndarray       # (O, 3)
    pat_b: jnp.ndarray       # (O, 3)
    pat_inv: jnp.ndarray     # (O, 3, 4) pattern_inv @ object_inv

    # triangle-cluster acceleration (Morton-ordered chunks; the TPU-native
    # replacement for the reference's per-group AABB cull, src/shape.rs:399-425)
    # C is padded to a multiple of SUPER_WIDTH with empty boxes so the kernel
    # hierarchy needs no bounds checks
    cluster_aabb: jnp.ndarray     # (C, 6): min xyz, max xyz
    super_aabb: jnp.ndarray       # (S, 6): union of SUPER_WIDTH clusters

    # refractive-mesh container slabs ((0,0,3)/(0,0) when the scene has no
    # transparent meshes): a compact copy of each refractive mesh object's
    # triangles so the n1/n2 crossing-parity walk can count per-object
    # crossings — the shape-agnostic equivalent of the reference's containers
    # walk (src/intersection.rs:29-62). refr_tri_gid carries the global
    # triangle-table row of each entry (-1 padding) so the integrator can
    # exclude the hit triangle itself from its own parity count.
    refr_tri_p1: jnp.ndarray      # (Km, Tm, 3)
    refr_tri_e1: jnp.ndarray      # (Km, Tm, 3)
    refr_tri_e2: jnp.ndarray      # (Km, Tm, 3)
    refr_tri_gid: jnp.ndarray     # (Km, Tm) i32

    # the single point light (reference: src/light.rs:5-8)
    light_pos: jnp.ndarray        # (3,)
    light_intensity: jnp.ndarray  # (3,)

    # instanced (TLAS) acceleration tables; None unless static.tlas_n_inst
    tlas: TlasTables = None

    static: SceneStatic = dataclasses.field(
        default=None, metadata=dict(static=True))


jax.tree_util.register_dataclass(
    Scene,
    data_fields=[f.name for f in dataclasses.fields(Scene) if f.name != "static"],
    meta_fields=["static"],
)


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of v so they occupy every 3rd bit."""
    v = v.astype(np.uint64) & 0x3FF
    v = (v | (v << 16)) & np.uint64(0x030000FF)
    v = (v | (v << 8)) & np.uint64(0x0300F00F)
    v = (v | (v << 4)) & np.uint64(0x030C30C3)
    v = (v | (v << 2)) & np.uint64(0x09249249)
    return v


def _kd_order(centroid: np.ndarray, leaf: int) -> np.ndarray:
    """Balanced k-d ordering: recursively split the triangle set at a
    leaf-aligned median of the widest centroid axis, so consecutive
    `leaf`-sized chunks are compact spatial cells. Compared to Morton-order
    chunking this roughly halves cluster-AABB overlap (fewer clusters
    visited per ray tile in the kernel's front-to-back traversal)."""
    out = []

    def rec(idx):
        n = len(idx)
        if n <= leaf:
            out.append(idx)
            return
        c = centroid[idx]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        n_leaves = -(-n // leaf)
        mid = (n_leaves // 2) * leaf
        part = np.argpartition(c[:, ax], mid)
        rec(idx[part[:mid]])
        rec(idx[part[mid:]])

    rec(np.arange(len(centroid)))
    return np.concatenate(out)


def _cluster_triangles(p1, e1, e2, n, obj, sn, leaf: int):
    """Spatially order the triangles (balanced k-d median split) and chunk
    into fixed-size clusters with AABBs — the flat, gather-free acceleration
    structure the Pallas kernel culls against (replacing the reference's
    per-ray group-AABB rebuild, src/shape.rs:399-425 + bounds.rs).

    Also returns src (T_padded,) i32: the pre-clustering row each final row
    came from (-1 for padding) — the permutation record the TLAS gid tables
    need to translate instance-local winners into final-table rows."""
    t = len(p1)
    centroid = p1 + (e1 + e2) / 3.0
    order = _kd_order(centroid, leaf)
    p1, e1, e2, n, obj = p1[order], e1[order], e2[order], n[order], obj[order]
    src = order.astype(np.int32)
    if sn is not None:
        sn = sn[:, order]

    pad = (-t) % leaf
    if pad:
        z3 = np.zeros((pad, 3))
        p1 = np.concatenate([p1, z3])
        e1 = np.concatenate([e1, z3])  # zero edges -> Möller-Trumbore det guard rejects
        e2 = np.concatenate([e2, z3])
        n = np.concatenate([n, z3])
        obj = np.concatenate([obj, np.zeros((pad,), dtype=obj.dtype)])
        src = np.concatenate([src, np.full((pad,), -1, dtype=np.int32)])
        if sn is not None:
            sn = np.concatenate([sn, np.zeros((3, pad, 3))], axis=1)
    n_clusters = len(p1) // leaf

    aabb = np.zeros((n_clusters, 6))
    for c in range(n_clusters):
        s = slice(c * leaf, min((c + 1) * leaf, t))
        if s.start >= t:
            # all-padding cluster: empty box that no ray can hit
            aabb[c, :3] = 1.0
            aabb[c, 3:] = -1.0
            continue
        verts = np.concatenate([p1[s], p1[s] + e1[s], p1[s] + e2[s]])
        aabb[c, :3] = verts.min(axis=0)
        aabb[c, 3:] = verts.max(axis=0)

    # pad clusters to a multiple of SUPER_WIDTH with empty boxes, then build
    # the supercluster level (empty boxes: lo > hi, never overlap)
    cpad = (-n_clusters) % SUPER_WIDTH
    if cpad:
        empty = np.zeros((cpad, 6))
        empty[:, :3] = 1.0
        empty[:, 3:] = -1.0
        aabb = np.concatenate([aabb, empty])
        # keep T == n_clusters * leaf (degenerate rows; never visited because
        # the padding clusters' AABBs are empty)
        z3 = np.zeros((cpad * leaf, 3))
        p1 = np.concatenate([p1, z3])
        e1 = np.concatenate([e1, z3])
        e2 = np.concatenate([e2, z3])
        n = np.concatenate([n, z3])
        obj = np.concatenate([obj, np.zeros((cpad * leaf,), dtype=obj.dtype)])
        src = np.concatenate([src, np.full((cpad * leaf,), -1, dtype=np.int32)])
        if sn is not None:
            sn = np.concatenate([sn, np.zeros((3, cpad * leaf, 3))], axis=1)
    n_super = len(aabb) // SUPER_WIDTH
    sup = np.zeros((n_super, 6))
    for si in range(n_super):
        block = aabb[si * SUPER_WIDTH:(si + 1) * SUPER_WIDTH]
        real = block[:, 0] <= block[:, 3]
        if real.any():
            sup[si, :3] = block[real, :3].min(axis=0)
            sup[si, 3:] = block[real, 3:].max(axis=0)
        else:
            sup[si, :3] = 1.0
            sup[si, 3:] = -1.0
    return p1, e1, e2, n, obj, sn, aabb, sup, src


def _cluster_mesh(p1, e1, e2, n, leaf: int, sn=None):
    """Object-space clustering of ONE unique mesh for the TLAS tables: k-d
    reorder, chunk to `leaf`, per-cluster AABBs. Returns the padded tables,
    AABBs, and src (pre-reorder row per final row, -1 padding)."""
    t = len(p1)
    order = _kd_order(p1 + (e1 + e2) / 3.0, leaf)
    p1, e1, e2, n = p1[order], e1[order], e2[order], n[order]
    sn = None if sn is None else sn[order]
    src = order.astype(np.int32)
    pad = (-t) % leaf
    if pad:
        z3 = np.zeros((pad, 3))
        p1 = np.concatenate([p1, z3])
        e1 = np.concatenate([e1, z3])
        e2 = np.concatenate([e2, z3])
        n = np.concatenate([n, z3])
        if sn is not None:
            sn = np.concatenate([sn, np.zeros((pad, 9))])
        src = np.concatenate([src, np.full((pad,), -1, np.int32)])
    cm = len(p1) // leaf
    aabb = np.zeros((cm, 6))
    for c in range(cm):
        s = slice(c * leaf, min((c + 1) * leaf, t))
        verts = np.concatenate([p1[s], p1[s] + e1[s], p1[s] + e2[s]])
        aabb[c, :3] = verts.min(axis=0)
        aabb[c, 3:] = verts.max(axis=0)
    return p1, e1, e2, n, src, aabb, sn


def _build_tlas(tri_leaves, inv_of, leaf: int, n_tris: int, tri_src,
                leaf_offsets, n_prims: int, any_smooth: bool):
    """Instanced (TLAS) tables when the scene is many transformed copies of
    shared mesh geometry. Eligible when: every triangle leaf is a mesh
    (flat OR smooth), the world-baked table overflows the kernel VMEM
    budget (it would have to stream superblocks), and the UNIQUE geometry
    fits it. Smooth meshes additionally carry a (Tu, 9) object-space
    corner-normal slab; the TLAS kernel blends it in-kernel (with_sn). In a
    mixed scene a flat mesh replicates its face normal into all three
    corners, making the blend a no-op. Returns
    (TlasTables-as-numpy | None, n_inst, n_mesh, cm)."""
    from ..ops.pallas.mesh_intersect import VMEM_TRI_BUDGET

    if (len(tri_leaves) < 2 or n_tris <= VMEM_TRI_BUDGET
            or any(s.kind != "mesh" for s in tri_leaves)):
        return None, 0, 0, 0
    use_sn = any(s.vn1 is not None for s in tri_leaves)

    import hashlib

    unique, inst_mesh = {}, []
    for s in tri_leaves:
        h = hashlib.blake2b(digest_size=16)
        for a in (s.v1, s.v2, s.v3):
            h.update(np.ascontiguousarray(a).tobytes())
        for a in (s.vn1, s.vn2, s.vn3):
            if a is not None:
                h.update(np.ascontiguousarray(a).tobytes())
        inst_mesh.append(unique.setdefault(
            (h.digest(), len(s.v1), s.vn1 is not None),
            (len(unique), s))[0])
    meshes = [rep for (_, rep) in sorted(unique.values())]
    inst_mesh = np.asarray(inst_mesh, np.int32)

    def _unit(a):
        nrm = np.linalg.norm(a, axis=-1, keepdims=True)
        return np.divide(a, nrm, out=np.zeros_like(a), where=nrm != 0)

    clustered = []
    for rep in meshes:
        e1o, e2o, no = triangle_edges(rep.v1, rep.v2, rep.v3)
        sn_m = None
        if use_sn:
            corners = ((rep.vn1, rep.vn2, rep.vn3)
                       if rep.vn1 is not None else (no, no, no))
            sn_m = np.concatenate([_unit(c) for c in corners], axis=1)
        clustered.append(_cluster_mesh(rep.v1, e1o, e2o, no, leaf, sn=sn_m))
    cm = max(c[5].shape[0] for c in clustered)
    cm = -(-cm // 8) * 8
    n_mesh = len(meshes)
    # VMEM cost per unique triangle: 40 f32 of MT features + the payload
    # slab (3 face-normal rows flat, 9 corner rows smooth) — shrink the
    # budget accordingly so smooth TLAS scenes stay within the same VMEM
    budget = VMEM_TRI_BUDGET if not use_sn else (VMEM_TRI_BUDGET * 43) // 49
    if n_mesh * cm * leaf > budget:
        return None, 0, 0, 0

    tm = cm * leaf
    p1 = np.zeros((n_mesh * tm, 3))
    e1 = np.zeros((n_mesh * tm, 3))
    e2 = np.zeros((n_mesh * tm, 3))
    nrm = np.zeros((n_mesh * tm, 3))
    snc = np.zeros((n_mesh * tm, 9)) if use_sn else np.zeros((0, 9))
    caabb = np.zeros((n_mesh * cm, 6))
    caabb[:, :3] = 1.0
    caabb[:, 3:] = -1.0  # padding clusters: empty boxes, never scheduled
    mesh_src = np.full((n_mesh, tm), -1, np.int32)
    for m, (mp1, me1, me2, mn, msrc, mab, msn) in enumerate(clustered):
        k = len(mp1)
        p1[m * tm:m * tm + k] = mp1
        e1[m * tm:m * tm + k] = me1
        e2[m * tm:m * tm + k] = me2
        nrm[m * tm:m * tm + k] = mn
        if use_sn:
            snc[m * tm:m * tm + k] = msn
        mesh_src[m, :k] = msrc
        caabb[m * cm:m * cm + len(mab)] = mab

    # world_of: pre-cluster concat row -> final world-table row
    world_of = np.zeros((max(int(tri_src.max()) + 1, 1),), np.int64)
    real = tri_src >= 0
    world_of[tri_src[real]] = np.nonzero(real)[0]

    n_inst = len(tri_leaves)
    i_pad = -(-n_inst // 8) * 8
    inst_ab = np.zeros((i_pad, 12))
    inst_ab[:, 0] = inst_ab[:, 4] = inst_ab[:, 8] = 1.0  # identity padding
    inst_rf = np.zeros((i_pad * 16, 10))
    for i in range(i_pad):
        inst_rf[i * 16:i * 16 + 10] = np.eye(10)         # identity padding
    inst_aabb = np.zeros((i_pad, 6))
    inst_aabb[:, :3] = 1.0
    inst_aabb[:, 3:] = -1.0  # padding instances: empty boxes
    inst_obj = np.zeros((i_pad,), np.int32)
    inst_mesh_p = np.zeros((i_pad,), np.int32)
    inst_mesh_p[:n_inst] = inst_mesh
    gid = np.zeros((i_pad, tm), np.int32)
    for i, s in enumerate(tri_leaves):
        m = int(inst_mesh[i])
        inv = inv_of(s)
        A = inv[:3, :3]
        b = inv[:3, 3]
        inst_ab[i, :9] = A.reshape(9)
        inst_ab[i, 9:] = b
        # rayf' = rayf @ M: d' = A d; o' = A o + b;
        # o' x d' = (Ao + b) x (Ad) = cof(A) (o x d) + skew(b) A d
        cof = np.linalg.inv(A).T * np.linalg.det(A)
        skb = np.array([[0.0, -b[2], b[1]],
                        [b[2], 0.0, -b[0]],
                        [-b[1], b[0], 0.0]])
        M = np.zeros((10, 10))
        M[0:3, 0:3] = A.T
        M[0:3, 3:6] = (skb @ A).T
        M[3:6, 3:6] = cof.T
        M[6:9, 6:9] = A.T
        M[9, 6:9] = b
        M[9, 9] = 1.0
        inst_rf[i * 16:i * 16 + 10] = M
        inst_obj[i] = n_prims + i
        # world AABB: union of the mesh's object-space cluster boxes pushed
        # through the instance's object->world transform (8 corners each)
        o2w = s.transform
        boxes = clustered[m][5]
        corners = np.stack(np.meshgrid(
            *[[0, 1]] * 3, indexing="ij"), axis=-1).reshape(8, 3)
        pts = (boxes[:, None, :3] * (1 - corners)[None]
               + boxes[:, None, 3:] * corners[None]).reshape(-1, 3)
        w = pts @ o2w[:3, :3].T + o2w[:3, 3]
        inst_aabb[i, :3] = w.min(axis=0)
        inst_aabb[i, 3:] = w.max(axis=0)
        msrc = mesh_src[m]
        rows = leaf_offsets[i] + np.maximum(msrc, 0)
        gid[i] = np.where(msrc >= 0, world_of[rows], 0).astype(np.int32)

    tables = dict(p1=p1, e1=e1, e2=e2, n=nrm, caabb=caabb, inst_ab=inst_ab,
                  inst_rf=inst_rf, inst_aabb=inst_aabb, inst_obj=inst_obj,
                  inst_mesh=inst_mesh_p, gid=gid, sn=snc)
    return tables, i_pad, n_mesh, cm


def _flatten(world: World):
    leaves = []

    def walk(s: Shape):
        if s.kind == "group":
            for c in s.children:
                walk(c)
        else:
            leaves.append(s)

    for obj in world.objects:
        walk(obj)
    return leaves


def compile_scene(world: World, dtype=jnp.float32, cluster_size: int = 128,
                  containers: str = "refractive") -> Scene:
    """containers selects the n1/n2 census membership rule:

      * "refractive" (default): only objects with ior != 1 or transparency
        > 0 join the containers census. Values match the reference except in
        the degenerate shading-while-inside-an-opaque-ior-1-object case
        (such objects contribute n = 1.0 either way almost everywhere).
      * "all": EVERY object is a container, bit-matching the reference's
        walk over the full intersection list
        (/root/reference/src/intersection.rs:29-62) — a ray inside a glass
        sphere that then enters an opaque ior == 1 object sees n1 = 1.0
        (the opaque object is the latest container), not 1.5.
    """
    if containers not in ("refractive", "all"):
        raise ValueError(f"containers must be 'refractive' or 'all', "
                         f"got {containers!r}")
    dtype = jnp.dtype(dtype)
    leaves = _flatten(world)
    prims = [s for s in leaves if s.kind in KIND_CODES]
    tri_leaves = [s for s in leaves if s.kind in ("triangle", "mesh")]
    objects = prims + tri_leaves  # object-id space

    n_prims = len(prims)
    n_objects = len(objects)

    # --- analytic prims -----------------------------------------------------
    prim_kind = np.array([KIND_CODES[s.kind] for s in prims], dtype=np.int32)
    prim_obj = np.arange(n_prims, dtype=np.int32)
    prim_inv = np.zeros((n_prims, 3, 4))
    prim_invT = np.zeros((n_prims, 3, 3))
    prim_params = np.zeros((n_prims, 3))
    inv_cache = {}

    def inv_of(s: Shape) -> np.ndarray:
        key = id(s)
        if key not in inv_cache:
            inv_cache[key] = np.linalg.inv(s.transform)
        return inv_cache[key]

    for i, s in enumerate(prims):
        inv = inv_of(s)
        prim_inv[i] = inv[:3, :4]
        prim_invT[i] = inv[:3, :3].T
        prim_params[i] = [
            np.clip(s.minimum, -Y_INF, Y_INF),
            np.clip(s.maximum, -Y_INF, Y_INF),
            1.0 if s.capped else 0.0,
        ]

    # --- triangles ----------------------------------------------------------
    tp1, te1, te2, tn, tobj, tsn = [], [], [], [], [], []
    leaf_offsets = []  # start row of each leaf in the pre-cluster concat
    any_smooth = any(
        l.kind == "mesh" and l.vn1 is not None for l in tri_leaves)
    for li, s in enumerate(tri_leaves):
        obj_id = n_prims + li
        if s.kind == "triangle":
            v1 = s.p1[None, :]
            v2 = s.p2[None, :]
            v3 = s.p3[None, :]
        else:  # mesh
            v1, v2, v3 = s.v1, s.v2, s.v3
        # object-space edge/normal exactly as the reference triangle ctor
        # (src/shape.rs:171-193), then transform:
        _, _, n_obj = triangle_edges(v1, v2, v3)
        m = s.transform
        inv = inv_of(s)
        w1 = v1 @ m[:3, :3].T + m[:3, 3]
        w2 = v2 @ m[:3, :3].T + m[:3, 3]
        w3 = v3 @ m[:3, :3].T + m[:3, 3]
        # world normal = normalize(invT @ n_obj) (src/shape.rs:623-635)
        nw = n_obj @ inv[:3, :3]  # (n @ invT.T) == n @ inv
        norm = np.linalg.norm(nw, axis=-1, keepdims=True)
        nw = np.divide(nw, norm, out=np.zeros_like(nw), where=norm != 0)
        leaf_offsets.append(sum(len(a) for a in tp1))
        tp1.append(w1)
        te1.append(w2 - w1)
        te2.append(w3 - w1)
        tn.append(nw)
        tobj.append(np.full((len(w1),), obj_id, dtype=np.int32))
        if any_smooth:
            if s.kind == "mesh" and s.vn1 is not None:
                corners = []
                for vn in (s.vn1, s.vn2, s.vn3):
                    cw = vn @ inv[:3, :3]  # invT applied (row-vector form)
                    nrm = np.linalg.norm(cw, axis=-1, keepdims=True)
                    corners.append(
                        np.divide(cw, nrm, out=np.zeros_like(cw), where=nrm != 0))
                tsn.append(np.stack(corners))          # (3, T_leaf, 3)
            else:
                tsn.append(np.stack([nw, nw, nw]))      # flat: interp is a no-op

    if tp1:
        tri_p1 = np.concatenate(tp1)
        tri_e1 = np.concatenate(te1)
        tri_e2 = np.concatenate(te2)
        tri_n = np.concatenate(tn)
        tri_obj = np.concatenate(tobj)
    else:
        tri_p1 = tri_e1 = tri_e2 = tri_n = np.zeros((0, 3))
        tri_obj = np.zeros((0,), dtype=np.int32)

    tri_sn = np.concatenate(tsn, axis=1) if tsn else None

    n_clusters = 0
    tri_src = np.zeros((0,), dtype=np.int32)
    if len(tri_p1) and cluster_size:
        (tri_p1, tri_e1, tri_e2, tri_n, tri_obj, tri_sn,
         cluster_aabb, super_aabb, tri_src) = _cluster_triangles(
            tri_p1, tri_e1, tri_e2, tri_n, tri_obj, tri_sn, cluster_size)
        n_clusters = len(cluster_aabb)
    else:
        cluster_aabb = np.zeros((0, 6))
        super_aabb = np.zeros((0, 6))
    n_tris = len(tri_p1)
    if tri_sn is None:
        tri_sn = np.zeros((3, 0, 3))

    # --- per-object material/pattern tables ---------------------------------
    def col(getter, default=0.0):
        return np.array([getter(o.material) for o in objects]) if objects else np.zeros((0,))

    mat_color = (
        np.array([o.material.color for o in objects]) if objects else np.zeros((0, 3))
    )
    mat_ambient = col(lambda m: m.ambient)
    mat_diffuse = col(lambda m: m.diffuse)
    mat_specular = col(lambda m: m.specular)
    mat_shininess = col(lambda m: m.shininess)
    mat_reflective = col(lambda m: m.reflective)
    mat_transparency = col(lambda m: m.transparency)
    mat_ior = col(lambda m: m.refractive_index)

    pat_kind = np.full((n_objects,), pattern_ops.NONE, dtype=np.int32)
    pat_a = mat_color.copy() if n_objects else np.zeros((0, 3))
    pat_b = np.zeros((n_objects, 3))
    pat_inv = np.zeros((n_objects, 3, 4))
    for i, o in enumerate(objects):
        obj_inv = inv_of(o)
        p = o.material.pattern
        if p is None:
            pat_inv[i] = obj_inv[:3, :4]
        else:
            pat_kind[i] = p.kind
            pat_a[i] = p.a
            pat_b[i] = p.b
            pat_inv[i] = (np.linalg.inv(p.transform) @ obj_inv)[:3, :4]

    def _is_container(m) -> bool:
        return (containers == "all" or m.transparency > 0.0
                or m.refractive_index != 1.0)

    refr_ids = tuple(
        int(i) for i, s in enumerate(prims) if _is_container(s.material))

    # refractive mesh containers: compact per-object triangle slabs (rows are
    # gathered AFTER Morton clustering so refr_tri_gid indexes the final
    # triangle table)
    refr_mesh_ids = tuple(
        int(n_prims + li)
        for li, s in enumerate(tri_leaves)
        if _is_container(s.material)
    )
    if refr_mesh_ids and n_tris:
        # padding rows have zero edges; a real triangle always has a nonzero
        # edge (degenerate ones would be det-guard rejected anyway)
        real = (np.abs(tri_e1).sum(axis=1) > 0) | (np.abs(tri_e2).sum(axis=1) > 0)
        rows = [np.where((tri_obj == oid) & real)[0] for oid in refr_mesh_ids]
        t_max = max((len(r) for r in rows), default=0)
        t_max = max(-(-t_max // 8) * 8, 8)
        km = len(rows)
        refr_tri_p1 = np.zeros((km, t_max, 3))
        refr_tri_e1 = np.zeros((km, t_max, 3))
        refr_tri_e2 = np.zeros((km, t_max, 3))
        refr_tri_gid = np.full((km, t_max), -1, dtype=np.int32)
        for ki, r in enumerate(rows):
            refr_tri_p1[ki, : len(r)] = tri_p1[r]
            refr_tri_e1[ki, : len(r)] = tri_e1[r]
            refr_tri_e2[ki, : len(r)] = tri_e2[r]
            refr_tri_gid[ki, : len(r)] = r
    else:
        refr_mesh_ids = ()
        refr_tri_p1 = refr_tri_e1 = refr_tri_e2 = np.zeros((0, 0, 3))
        refr_tri_gid = np.zeros((0, 0), dtype=np.int32)

    # per-triangle container slot (static per scene): -1 for non-container
    # and for padding rows (degenerate triangles would never be counted, but
    # keeping them -1 also keeps all-padding clusters out of the census
    # kernel's traversal schedule)
    tri_cid = np.full((n_tris,), -1, dtype=np.int32)
    if refr_mesh_ids:
        real_tri = (np.abs(tri_e1).sum(axis=1) > 0) | (np.abs(tri_e2).sum(axis=1) > 0)
        for k, oid in enumerate(refr_mesh_ids):
            tri_cid[(tri_obj == oid) & real_tri] = k

    tlas_np, tlas_ni, tlas_nm, tlas_cm = (None, 0, 0, 0)
    if n_clusters:
        tlas_np, tlas_ni, tlas_nm, tlas_cm = _build_tlas(
            tri_leaves, inv_of, cluster_size, n_tris, tri_src, leaf_offsets,
            n_prims, any_smooth)

    static = SceneStatic(
        n_prims=n_prims,
        n_tris=n_tris,
        n_objects=n_objects,
        refr_prim_ids=refr_ids,
        refr_mesh_obj_ids=refr_mesh_ids,
        any_reflective=any(o.material.reflective > 0.0 for o in objects),
        any_refractive=any(o.material.transparency > 0.0 for o in objects),
        any_pattern=any(o.material.pattern is not None for o in objects),
        n_clusters=n_clusters,
        cluster_size=cluster_size if n_clusters else 0,
        any_smooth=bool(any_smooth and n_tris),
        n_super=len(super_aabb),
        single_tri_obj=(n_prims if len(tri_leaves) == 1 else -1),
        tlas_n_inst=tlas_ni,
        tlas_n_mesh=tlas_nm,
        tlas_cm=tlas_cm,
        tlas_sn=bool(tlas_np is not None and tlas_np["sn"].shape[0]),
    )

    f = lambda a: jnp.asarray(a, dtype=dtype)
    i32 = lambda a: jnp.asarray(a, dtype=jnp.int32)
    return Scene(
        prim_kind=i32(prim_kind),
        prim_inv=f(prim_inv),
        prim_invT=f(prim_invT),
        prim_params=f(prim_params),
        prim_obj=i32(prim_obj),
        tri_p1=f(tri_p1),
        tri_e1=f(tri_e1),
        tri_e2=f(tri_e2),
        tri_n=f(tri_n),
        tri_obj=i32(tri_obj),
        tri_cid=i32(tri_cid),
        tri_sn1=f(tri_sn[0]),
        tri_sn2=f(tri_sn[1]),
        tri_sn3=f(tri_sn[2]),
        cluster_aabb=f(cluster_aabb),
        super_aabb=f(super_aabb),
        mat_color=f(mat_color),
        mat_ambient=f(mat_ambient),
        mat_diffuse=f(mat_diffuse),
        mat_specular=f(mat_specular),
        mat_shininess=f(mat_shininess),
        mat_reflective=f(mat_reflective),
        mat_transparency=f(mat_transparency),
        mat_ior=f(mat_ior),
        pat_kind=i32(pat_kind),
        pat_a=f(pat_a),
        pat_b=f(pat_b),
        pat_inv=f(pat_inv),
        refr_tri_p1=f(refr_tri_p1),
        refr_tri_e1=f(refr_tri_e1),
        refr_tri_e2=f(refr_tri_e2),
        refr_tri_gid=i32(refr_tri_gid),
        light_pos=f(np.asarray(world.light.position, dtype=np.float64)),
        light_intensity=f(np.asarray(world.light.intensity, dtype=np.float64)),
        tlas=None if tlas_np is None else TlasTables(
            p1=f(tlas_np["p1"]), e1=f(tlas_np["e1"]), e2=f(tlas_np["e2"]),
            n=f(tlas_np["n"]), caabb=f(tlas_np["caabb"]),
            inst_ab=f(tlas_np["inst_ab"]), inst_rf=f(tlas_np["inst_rf"]),
            inst_aabb=f(tlas_np["inst_aabb"]),
            inst_obj=i32(tlas_np["inst_obj"]),
            inst_mesh=i32(tlas_np["inst_mesh"]), gid=i32(tlas_np["gid"]),
            sn=f(tlas_np["sn"])),
        static=static,
    )
