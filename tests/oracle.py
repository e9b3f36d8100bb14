"""Test-only NumPy oracle: a direct, scalar-per-ray transliteration of the
reference integrator, independent of every production code path.

Semantics transliterated from (file:line refer to /root/reference):
  * World::internal_color_at / shade_hit / reflected_color / refracted_color /
    is_shadowed                                  src/world.rs:43-163
  * Intersection::prepare_computations (n1/n2 containers walk, over/under
    points) + hit() + Computations::schlick      src/intersection.rs:17-128
  * Shape::intersect per-kind math + normal_at   src/shape.rs:248-519
  * Material::lighting (Phong)                   src/material.rs:32-75
  * Pattern::color_at / color_at_shape           src/pattern.rs:68-103

The production goldens are self-goldens (tests/test_golden.py); this module
is the independent implementation that catches composed-semantics drift: a
systematic error in a shared assumption (shading frame, budget bookkeeping,
n1/n2 walk) would disagree here even though every component test passes.

Deliberate divergences from the reference (documented, matching production):
  * no group-AABB culling (the reference's Bounds::new has two latent bugs —
    origin-seeded fold, finite plane box — that can only REJECT real hits;
    production and oracle both skip the cull, bounds are a pure optimization);
  * smooth (per-corner-normal) meshes are supported — the feature the
    reference stubs out (src/intersection.rs:381-386) — by barycentric
    interpolation of per-corner world normals, matching production;
  * the containers walk enrolls every object ("all" semantics,
    src/intersection.rs:29-62), with object identity = builder leaf identity
    (the reference compares by value; registry scenes have no value-equal
    distinct objects);
  * a mesh is ONE container (crossing parity), matching production: in the
    reference each triangle is its own Shape, so crossing a closed mesh
    would leave two triangles in the containers list forever — a semantics
    accident the reference never exercises (it has no transparent meshes).

Everything is float64 and per-ray scalar (mesh leaves vectorize over their
own triangles with NumPy, which changes no semantics).
"""

from __future__ import annotations

import math

import numpy as np

EPSILON = 1e-5  # src/utils.rs:2
BLACK = np.zeros(3)

# pattern kind codes (mirrors rtc_tpu.ops.patterns)
P_NONE, P_STRIPE, P_GRADIENT, P_RING, P_CHECKERS, P_TEST = -1, 0, 1, 2, 3, 4


class Leaf:
    """A flattened scene leaf (transforms were pushed down at build time,
    src/shape.rs:207-218, so the tree is already flat)."""

    def __init__(self, shape, index: int):
        self.kind = shape.kind
        self.index = index
        self.transform = np.asarray(shape.transform, np.float64)
        self.inv = np.linalg.inv(self.transform)
        self.invT = self.inv.T
        self.material = shape.material
        self.minimum = float(shape.minimum)
        self.maximum = float(shape.maximum)
        self.capped = bool(shape.capped)
        if shape.kind == "triangle":
            v1 = np.asarray(shape.p1, np.float64)[None]
            v2 = np.asarray(shape.p2, np.float64)[None]
            v3 = np.asarray(shape.p3, np.float64)[None]
        elif shape.kind == "mesh":
            v1 = np.asarray(shape.v1, np.float64)
            v2 = np.asarray(shape.v2, np.float64)
            v3 = np.asarray(shape.v3, np.float64)
        else:
            self.p1 = None
            return
        # triangle ctor precomputation (src/shape.rs:171-193)
        self.p1 = v1
        self.e1 = v2 - v1
        self.e2 = v3 - v1
        n = np.cross(self.e2, self.e1)
        self.n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-300)
        self.smooth = shape.kind == "mesh" and shape.vn1 is not None
        if self.smooth:
            self.vn = [np.asarray(v, np.float64)
                       for v in (shape.vn1, shape.vn2, shape.vn3)]


def flatten(world):
    leaves = []

    def walk(s):
        if s.kind == "group":
            for c in s.children:
                walk(c)
        else:
            leaves.append(Leaf(s, len(leaves)))

    for obj in world.objects:
        walk(obj)
    return leaves


def _norm(v):
    return v / np.linalg.norm(v)


def _reflect(v, n):
    return v - n * (2.0 * np.dot(v, n))  # src/tuple.rs reflect


def _check_axis(lo, hi, origin, direction):
    """src/shape.rs:587-606."""
    if abs(direction) >= EPSILON:
        tmin = (lo - origin) / direction
        tmax = (hi - origin) / direction
    else:
        tmin = (lo - origin) * math.inf
        tmax = (hi - origin) * math.inf
    return (tmax, tmin) if tmin > tmax else (tmin, tmax)


def _check_cap(o, d, t):
    """Radius |y| quirk kept verbatim (src/shape.rs:579-585)."""
    x = o[0] + t * d[0]
    y = o[1] + t * d[1]
    z = o[2] + t * d[2]
    return x * x + z * z <= abs(y)


def _caps(leaf, o, d, out):
    """src/shape.rs:537-577."""
    if not leaf.capped or abs(d[1]) < EPSILON:
        return
    for plane_y in (leaf.minimum, leaf.maximum):
        t = (plane_y - o[1]) / d[1]
        if _check_cap(o, d, t):
            out.append(t)


def intersect_leaf(leaf: Leaf, wo, wd):
    """Shape::intersect (src/shape.rs:248-463). Returns a list of
    (t, leaf, tri_row, u, v); tri_row/u/v are None for analytic kinds."""
    o = leaf.inv[:3, :3] @ wo + leaf.inv[:3, 3]
    d = leaf.inv[:3, :3] @ wd
    ts = []
    if leaf.kind == "sphere":
        a = np.dot(d, d)
        b = 2.0 * np.dot(d, o)
        c = np.dot(o, o) - 1.0
        disc = b * b - 4.0 * a * c
        if disc >= 0.0:
            s = math.sqrt(disc)
            ts += [(-b - s) / (2 * a), (-b + s) / (2 * a)]
    elif leaf.kind == "plane":
        if abs(d[1]) >= EPSILON:
            ts.append(-o[1] / d[1])
    elif leaf.kind == "cube":
        xtmin, xtmax = _check_axis(-1.0, 1.0, o[0], d[0])
        ytmin, ytmax = _check_axis(-1.0, 1.0, o[1], d[1])
        ztmin, ztmax = _check_axis(-1.0, 1.0, o[2], d[2])
        tmin = max(xtmin, ytmin, ztmin)
        tmax = min(xtmax, ytmax, ztmax)
        if tmax >= tmin:
            ts += [tmin, tmax]
    elif leaf.kind == "cylinder":
        a = d[0] * d[0] + d[2] * d[2]
        if abs(a) >= EPSILON:  # is_almost_equal guard, src/shape.rs:325
            b = 2.0 * (o[0] * d[0] + o[2] * d[2])
            c = o[0] * o[0] + o[2] * o[2] - 1.0
            disc = b * b - 4.0 * a * c
            if disc >= 0.0:
                s = math.sqrt(disc)
                t0, t1 = sorted(((-b - s) / (2 * a), (-b + s) / (2 * a)))
                for t in (t0, t1):
                    y = o[1] + t * d[1]
                    if leaf.minimum < y < leaf.maximum:
                        ts.append(t)
        _caps(leaf, o, d, ts)
    elif leaf.kind == "cone":
        a = d[0] * d[0] - d[1] * d[1] + d[2] * d[2]
        b = 2.0 * (o[0] * d[0] - o[1] * d[1] + o[2] * d[2])
        c = o[0] * o[0] - o[1] * o[1] + o[2] * o[2]
        if abs(a) < EPSILON:
            if abs(b) >= EPSILON:
                ts.append(-c / (2.0 * b))
        else:
            disc = b * b - 4.0 * a * c
            if disc >= 0.0:
                s = math.sqrt(disc)
                t0, t1 = sorted(((-b - s) / (2 * a), (-b + s) / (2 * a)))
                for t in (t0, t1):
                    y = o[1] + t * d[1]
                    if leaf.minimum < y < leaf.maximum:
                        ts.append(t)
        _caps(leaf, o, d, ts)
    elif leaf.kind in ("triangle", "mesh"):
        # Möller-Trumbore, vectorized over the leaf's rows (src/shape.rs:437-459)
        dce2 = np.cross(d[None, :], leaf.e2)
        det = np.einsum("tj,tj->t", leaf.e1, dce2)
        ok = np.abs(det) >= EPSILON
        f = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        p1o = o[None, :] - leaf.p1
        u = f * np.einsum("tj,tj->t", p1o, dce2)
        oce1 = np.cross(p1o, leaf.e1)
        v = f * np.einsum("j,tj->t", d, oce1)
        t = f * np.einsum("tj,tj->t", leaf.e2, oce1)
        ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        return [(float(t[r]), leaf, int(r), float(u[r]), float(v[r]))
                for r in np.nonzero(ok)[0]]
    return [(float(t), leaf, None, None, None) for t in ts]


def intersect_world(leaves, o, d):
    """World::intersect: concat + stable sort by t (src/world.rs:43-54)."""
    xs = []
    for leaf in leaves:
        xs += intersect_leaf(leaf, o, d)
    xs.sort(key=lambda x: x[0])  # Python sort is stable, like Rust's sort_by
    return xs


def hit(xs):
    """min non-negative t (src/intersection.rs:79-84)."""
    best = None
    for x in xs:
        if x[0] >= 0.0 and (best is None or x[0] < best[0]):
            best = x
    return best


def normal_at(leaf: Leaf, world_point, tri_row, u, v):
    """src/shape.rs:466-519 (+ the smooth-mesh extension)."""
    if leaf.p1 is not None:
        if getattr(leaf, "smooth", False):
            # production extension: per-corner world normals, barycentric blend
            corners = [_norm(vn[tri_row] @ leaf.inv[:3, :3]) for vn in leaf.vn]
            n = ((1.0 - u - v) * corners[0] + u * corners[1] + v * corners[2])
            return _norm(n)
        nl = leaf.n[tri_row]
    else:
        p = leaf.inv[:3, :3] @ world_point + leaf.inv[:3, 3]
        if leaf.kind == "sphere":
            nl = p.copy()
        elif leaf.kind == "plane":
            nl = np.array([0.0, 1.0, 0.0])
        elif leaf.kind == "cube":
            ax, ay, az = abs(p[0]), abs(p[1]), abs(p[2])
            maxc = max(ax, ay, az)
            if maxc == ax:
                nl = np.array([p[0], 0.0, 0.0])
            elif maxc == ay:
                nl = np.array([0.0, p[1], 0.0])
            else:
                nl = np.array([0.0, 0.0, p[2]])
        elif leaf.kind == "cylinder":
            dist = p[0] * p[0] + p[2] * p[2]
            if dist < 1.0 and p[1] >= leaf.maximum - EPSILON:
                nl = np.array([0.0, 1.0, 0.0])
            elif dist < 1.0 and p[1] <= leaf.minimum + EPSILON:
                nl = np.array([0.0, -1.0, 0.0])
            else:
                nl = np.array([p[0], 0.0, p[2]])
        elif leaf.kind == "cone":
            y = math.sqrt(p[0] * p[0] + p[2] * p[2])
            if p[1] > 0.0:
                y = -y
            nl = np.array([p[0], y, p[2]])
        else:
            raise AssertionError(leaf.kind)
    # normal_to_world: invT linear part, renormalize (src/shape.rs:623-635)
    return _norm(nl @ leaf.inv[:3, :3])


class Comps:
    pass


def prepare_computations(x, o, d, xs):
    """src/intersection.rs:17-77."""
    t, leaf, tri_row, u, v = x
    c = Comps()
    c.t = t
    c.leaf = leaf
    c.point = o + d * t
    c.eyev = -d
    normalv = normal_at(leaf, c.point, tri_row, u, v)
    c.inside = np.dot(normalv, c.eyev) < 0.0
    if c.inside:
        normalv = -normalv
    c.normalv = normalv
    c.reflectv = _reflect(d, normalv)
    c.over_point = c.point + normalv * EPSILON
    c.under_point = c.point - normalv * EPSILON

    # containers walk over the FULL sorted list (src/intersection.rs:29-62);
    # membership toggles per crossing, identity by leaf
    containers = []
    c.n1 = 1.0
    c.n2 = 1.0
    for i in xs:
        is_self = i[0] == t and i[1] is leaf and i[2] == tri_row
        if is_self and containers:
            c.n1 = containers[-1].material.refractive_index
        try:
            containers.remove(i[1])
        except ValueError:
            containers.append(i[1])
        if is_self:
            if containers:
                c.n2 = containers[-1].material.refractive_index
            break
    return c


def schlick(c):
    """src/intersection.rs:102-128."""
    cos = np.dot(c.eyev, c.normalv)
    if c.n1 > c.n2:
        n = c.n1 / c.n2
        sin2_t = n * n * (1.0 - cos * cos)
        if sin2_t > 1.0:
            return 1.0
        cos = math.sqrt(1.0 - sin2_t)
    r0 = ((c.n1 - c.n2) / (c.n1 + c.n2)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cos) ** 5


PATTERN_EPS = 1e-4  # mirrors rtc_tpu.ops.patterns.PATTERN_EPS (boundary nudge)


def pattern_color_at(pat, point):
    """src/pattern.rs:68-95. Rust's % is remainder; parity outcomes agree
    with Python's floored % for the floor-valued operands used here.
    Carries the framework's documented PATTERN_EPS boundary nudge (the one
    deliberate deviation from the reference) so the 1e-9 cross-check holds
    on knife-edge pattern cells — see rtc_tpu/ops/patterns.py."""
    a = np.asarray(pat.a, np.float64)
    b = np.asarray(pat.b, np.float64)
    if pat.kind == P_STRIPE:
        return a if math.floor(point[0] + PATTERN_EPS) % 2.0 == 0.0 else b
    if pat.kind == P_GRADIENT:
        return a + (b - a) * (point[0] - math.floor(point[0]))
    if pat.kind == P_RING:
        r = math.sqrt(point[0] ** 2 + point[2] ** 2)
        return a if math.floor(r + PATTERN_EPS) % 2.0 == 0.0 else b
    if pat.kind == P_CHECKERS:
        s = (math.floor(point[0] + PATTERN_EPS)
             + math.floor(point[1] + PATTERN_EPS)
             + math.floor(point[2] + PATTERN_EPS))
        return a if s % 2.0 == 0.0 else b
    if pat.kind == P_TEST:
        return np.array(point[:3], np.float64)
    raise AssertionError(pat.kind)


def lighting(material, leaf, light, point, eyev, normalv, in_shadow):
    """src/material.rs:32-75."""
    if material.pattern is not None:
        # color_at_shape: object inverse then pattern inverse (src/pattern.rs:98-103)
        op = leaf.inv[:3, :3] @ point + leaf.inv[:3, 3]
        pinv = np.linalg.inv(np.asarray(material.pattern.transform, np.float64))
        pp = pinv[:3, :3] @ op + pinv[:3, 3]
        color = pattern_color_at(material.pattern, pp)
    else:
        color = np.asarray(material.color, np.float64)
    intensity = np.asarray(light.intensity, np.float64)
    effective = color * intensity
    lightv = _norm(np.asarray(light.position, np.float64) - point)
    ambient = effective * material.ambient
    diffuse = BLACK
    specular = BLACK
    if not in_shadow:
        ldn = np.dot(lightv, normalv)
        if ldn >= 0.0:
            diffuse = effective * material.diffuse * ldn
            reflectv = _reflect(-lightv, normalv)
            rde = np.dot(reflectv, eyev)
            if rde > 0.0:
                specular = intensity * material.specular * rde ** material.shininess
    return ambient + diffuse + specular


class Oracle:
    """World equivalent: flattened leaves + the single light."""

    def __init__(self, world, max_depth: int = 5):
        self.leaves = flatten(world)
        self.light = world.light
        self.max_depth = max_depth

    def color_at(self, o, d):
        """World::color_at (src/world.rs:80-82)."""
        return self._internal_color_at(np.asarray(o, np.float64),
                                       np.asarray(d, np.float64),
                                       self.max_depth)

    def _internal_color_at(self, o, d, remaining):
        """src/world.rs:84-98."""
        if remaining < 1:
            return BLACK
        xs = intersect_world(self.leaves, o, d)
        h = hit(xs)
        if h is None:
            return BLACK
        return self._shade_hit(prepare_computations(h, o, d, xs), remaining - 1)

    def _shade_hit(self, c, remaining):
        """src/world.rs:56-78."""
        material = c.leaf.material
        surface = lighting(material, c.leaf, self.light, c.point, c.eyev,
                           c.normalv, self._is_shadowed(c.over_point))
        reflected = self._reflected_color(c, remaining - 1)
        refracted = self._refracted_color(c, remaining - 1)
        if material.reflective > 0.0 and material.transparency > 0.0:
            r = schlick(c)
            return surface + reflected * r + refracted * (1.0 - r)
        return surface + reflected + refracted

    def _is_shadowed(self, point):
        """src/world.rs:100-114."""
        vec = np.asarray(self.light.position, np.float64) - point
        distance = np.linalg.norm(vec)
        h = hit(intersect_world(self.leaves, point, vec / distance))
        return h is not None and h[0] < distance

    def _reflected_color(self, c, remaining):
        """src/world.rs:116-129."""
        if remaining < 1 or c.leaf.material.reflective == 0.0:
            return BLACK
        color = self._internal_color_at(c.over_point, c.reflectv, remaining - 1)
        return color * c.leaf.material.reflective

    def _refracted_color(self, c, remaining):
        """src/world.rs:131-163."""
        if remaining < 1 or c.leaf.material.transparency == 0.0:
            return BLACK
        n_ratio = c.n1 / c.n2
        cos_i = np.dot(c.eyev, c.normalv)
        sin2_t = n_ratio * n_ratio * (1.0 - cos_i * cos_i)
        if sin2_t > 1.0:
            return BLACK  # total internal reflection
        cos_t = math.sqrt(1.0 - sin2_t)
        direction = c.normalv * (n_ratio * cos_i - cos_t) - c.eyev * n_ratio
        color = self._internal_color_at(c.under_point, direction, remaining - 1)
        return color * c.leaf.material.transparency


def camera_ray(cam, px, py):
    """Camera::ray_for_pixel (src/camera.rs:48-65), scalar."""
    inv = np.asarray(cam.transform_inverse, np.float64)
    xoff = (px + 0.5) * cam.pixel_size
    yoff = (py + 0.5) * cam.pixel_size
    wx = cam.half_width - xoff
    wy = cam.half_height - yoff
    pixel = inv[:3, :3] @ np.array([wx, wy, -1.0]) + inv[:3, 3]
    origin = inv[:3, 3].copy()
    return origin, _norm(pixel - origin)
