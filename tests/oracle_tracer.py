"""Independent brute-force path tracer — the correctness oracle.

A deliberately boring numpy/f64 renderer with NO imports from
raytrace_tpu: it reads the scene JSON directly and implements the
estimator from the reference's GLSL spec (ray_gen.glsl:457-541 bounce
loop, :252-341 NEE/MIS, :543-571 camera incl. the thin-lens DOF quirk)
and the documented quirks (gradient sky ignores direction, emission
front-face only, tMin=1e-3 / tMax=1e4, DOF lens offset scaled by NDC).
Agreement between this and the engine converts "the engine agrees with
itself" into "the engine agrees with an independent implementation of
the physics" (tests/test_oracle.py).

Supported: analytic uv_spheres (the engine's default geometry mode),
triangle/quad/box primitives, constant / image / checker / noise
textures (ray_gen.glsl:184-243; image decode per R8G8B8A8_SRGB, nearest
+repeat sampling), lambertian / metal / dielectric / diffuse_light
materials, solid + vertical-gradient sky, area-light NEE with the 50/50
mixture MIS, thin-lens DOF (ray_gen.glsl:553-561), and animated
instance transforms (TRS component lerp + axis-angle slerp ==
decomposed_transform.rs:17-24) via an explicit `times` list — the
caller passes the engine's batch ray times so both integrate the same
shutter distribution.

Box primitives get uv=(0,0) (their per-face cross-layout UVs are only
consumed by image textures, which no shipped scene puts on a box);
checker/noise are world-position-based and unaffected.
"""

from __future__ import annotations

import json
import os

import numpy as np

T_MIN, T_MAX = 1e-3, 1e4


# ----------------------------------------------------------------- noise

def _mod289(x):
    return x - np.floor(x * (1.0 / 289.0)) * 289.0


def _permute(x):
    # stegu/webgl-noise: mod289(((x*34)+10)*x) — the same public port
    # the reference's perlin.glsl uses.
    return _mod289(((x * 34.0) + 10.0) * x)


def _taylor_inv_sqrt(r):
    return 1.79284291400159 - 0.85373472095314 * r


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _cnoise(p):
    """Classic Perlin noise (perlin.glsl:26-84), vectorized f64.
    p: [n,3] -> [n]."""
    pi0 = _mod289(np.floor(p))
    pf0 = p - np.floor(p)
    pf1 = pf0 - 1.0
    pi1 = _mod289(pi0 + 1.0)

    ix = np.stack([pi0[:, 0], pi1[:, 0], pi0[:, 0], pi1[:, 0]], -1)
    iy = np.stack([pi0[:, 1], pi0[:, 1], pi1[:, 1], pi1[:, 1]], -1)
    iz0 = pi0[:, 2:3]
    iz1 = pi1[:, 2:3]

    ixy = _permute(_permute(ix) + iy)
    ixy0 = _permute(ixy + iz0)
    ixy1 = _permute(ixy + iz1)

    def grads(ixy_z):
        gx = ixy_z * (1.0 / 7.0)
        gy = (np.floor(gx) * (1.0 / 7.0))
        gy = gy - np.floor(gy) - 0.5
        gx = gx - np.floor(gx)
        gz = 0.5 - np.abs(gx) - np.abs(gy)
        sz = (gz <= 0.0).astype(np.float64)
        gx = gx - sz * ((gx >= 0.0).astype(np.float64) - 0.5)
        gy = gy - sz * ((gy >= 0.0).astype(np.float64) - 0.5)
        return gx, gy, gz

    gx0, gy0, gz0 = grads(ixy0)
    gx1, gy1, gz1 = grads(ixy1)

    def g(i, gx, gy, gz):
        return np.stack([gx[:, i], gy[:, i], gz[:, i]], -1)

    g000, g100, g010, g110 = (g(i, gx0, gy0, gz0) for i in range(4))
    g001, g101, g011, g111 = (g(i, gx1, gy1, gz1) for i in range(4))

    def dot(a, b):
        return np.sum(a * b, axis=-1)

    n0 = _taylor_inv_sqrt(np.stack(
        [dot(g000, g000), dot(g010, g010), dot(g100, g100),
         dot(g110, g110)], -1))
    n1 = _taylor_inv_sqrt(np.stack(
        [dot(g001, g001), dot(g011, g011), dot(g101, g101),
         dot(g111, g111)], -1))
    g000 = g000 * n0[:, 0:1]
    g010 = g010 * n0[:, 1:2]
    g100 = g100 * n0[:, 2:3]
    g110 = g110 * n0[:, 3:4]
    g001 = g001 * n1[:, 0:1]
    g011 = g011 * n1[:, 1:2]
    g101 = g101 * n1[:, 2:3]
    g111 = g111 * n1[:, 3:4]

    def v(x, y, z):
        return np.stack([x, y, z], -1)

    n000 = dot(g000, pf0)
    n100 = dot(g100, v(pf1[:, 0], pf0[:, 1], pf0[:, 2]))
    n010 = dot(g010, v(pf0[:, 0], pf1[:, 1], pf0[:, 2]))
    n110 = dot(g110, v(pf1[:, 0], pf1[:, 1], pf0[:, 2]))
    n001 = dot(g001, v(pf0[:, 0], pf0[:, 1], pf1[:, 2]))
    n101 = dot(g101, v(pf1[:, 0], pf0[:, 1], pf1[:, 2]))
    n011 = dot(g011, v(pf0[:, 0], pf1[:, 1], pf1[:, 2]))
    n111 = dot(g111, pf1)

    f = _fade(pf0)
    nx00 = n000 + f[:, 0] * (n100 - n000)
    nx10 = n010 + f[:, 0] * (n110 - n010)
    nx01 = n001 + f[:, 0] * (n101 - n001)
    nx11 = n011 + f[:, 0] * (n111 - n011)
    nxy0 = nx00 + f[:, 1] * (nx10 - nx00)
    nxy1 = nx01 + f[:, 1] * (nx11 - nx01)
    nxyz = nxy0 + f[:, 2] * (nxy1 - nxy0)
    return 2.2 * nxyz


def _turbulence(p, depth=7):
    """perlin.glsl:147-159."""
    accum = np.zeros(p.shape[0])
    tp = p.copy()
    weight = 1.0
    for _ in range(depth):
        accum += weight * _cnoise(tp)
        weight *= 0.5
        tp = tp * 2.0
    return np.abs(accum)


# ----------------------------------------------------------------- scene

def _uv_sphere_light_tris(center, radius, rings, segments):
    """Object-space triangles of the reference's UV-sphere tessellation
    (mesh.rs:155-258: pole rows have `segments` vertices with a du/2 u
    shift; interior rows `segments + 1`; top/bottom fans + ring quads).
    f32 vertex math like the engine's tessellator, promoted to f64.  Used
    for the NEE light table only — the oracle still TRACES spheres
    analytically."""
    c = np.asarray(center, np.float32)
    r = np.float32(radius)
    du = np.float32(1.0) / np.float32(segments)
    dv = np.float32(1.0) / np.float32(rings)
    verts = []
    for ring in range(rings + 1):
        top_bot = ring == 0 or ring == rings
        nseg = segments - 1 if top_bot else segments
        shift_u = du / np.float32(2.0) if top_bot else np.float32(0.0)
        for s in range(nseg + 1):
            u = np.float32(s) * du + shift_u
            v = np.float32(ring) * dv
            theta = np.float32(2.0 * np.pi) * u
            phi = np.float32(np.pi) * v
            n = np.array([-np.sin(phi) * np.cos(theta),
                          -np.cos(phi),
                          np.sin(phi) * np.sin(theta)], np.float32)
            verts.append(c + r * n)
    idx = []
    o1 = 0
    o2 = segments
    for ring in range(rings):
        for s in range(segments):
            if ring == 0:
                idx += [o1 + s, o2 + s, o2 + s + 1]
            elif ring < rings - 1:
                idx += [o1 + s, o2 + s, o2 + s + 1,
                        o1 + s + 1, o1 + s, o2 + s + 1]
            else:
                idx += [o1 + s + 1, o1 + s, o2 + s]
        o1 += segments if ring == 0 else segments + 1
        o2 = o1 + segments + 1
    verts = np.asarray(verts, np.float32).astype(np.float64)
    tri = np.asarray(idx, np.int64).reshape(-1, 3)
    return verts[tri]


def _quad_tris(points, normal, uvs=None):
    p = [np.asarray(q, np.float64) for q in points]
    n = np.asarray(normal, np.float64)
    uv = ([np.asarray(q, np.float64) for q in uvs] if uvs is not None
          else [np.zeros(2)] * 4)
    return [(p[0], p[1], p[2], n, (uv[0], uv[1], uv[2])),
            (p[0], p[2], p[3], n, (uv[0], uv[2], uv[3]))]


def _box_tris(c0, c1):
    lo = np.minimum(np.asarray(c0, np.float64), np.asarray(c1, np.float64))
    hi = np.maximum(np.asarray(c0, np.float64), np.asarray(c1, np.float64))
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    quads = [
        ([(x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1)], (0, 0, 1)),
        ([(x1, y0, z0), (x0, y0, z0), (x0, y1, z0), (x1, y1, z0)], (0, 0, -1)),
        ([(x1, y0, z1), (x1, y0, z0), (x1, y1, z0), (x1, y1, z1)], (1, 0, 0)),
        ([(x0, y0, z0), (x0, y0, z1), (x0, y1, z1), (x0, y1, z0)], (-1, 0, 0)),
        ([(x0, y1, z1), (x1, y1, z1), (x1, y1, z0), (x0, y1, z0)], (0, 1, 0)),
        ([(x0, y0, z0), (x1, y0, z0), (x1, y0, z1), (x0, y0, z1)], (0, -1, 0)),
    ]
    tris = []
    for q, n in quads:
        tris += _quad_tris(q, n)
    return tris


def _axis_angle_matrix(axis, degrees):
    ax = np.asarray(axis, np.float64)
    ax = ax / np.linalg.norm(ax)
    th = np.deg2rad(degrees)
    k = np.array([[0, -ax[2], ax[1]],
                  [ax[2], 0, -ax[0]],
                  [-ax[1], ax[0], 0]])
    return np.eye(3) + np.sin(th) * k + (1 - np.cos(th)) * (k @ k)


def _components(t):
    """Transform dict -> (translate[3], quat wxyz[4], scale[3])."""
    tr = np.asarray(t.get("translate") or [0.0, 0.0, 0.0], np.float64)
    sc = np.asarray(t.get("scale") or [1.0, 1.0, 1.0], np.float64)
    if t.get("rotate"):
        ax = np.asarray(t["rotate"]["axis"], np.float64)
        ax = ax / np.linalg.norm(ax)
        half = 0.5 * np.deg2rad(t["rotate"]["degrees"])
        q = np.array([np.cos(half), *(np.sin(half) * ax)])
    else:
        q = np.array([1.0, 0.0, 0.0, 0.0])
    return tr, q, sc


def _quat_matrix(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _slerp(q0, q1, s):
    d = float(q0 @ q1)
    if d < 0.0:
        q1, d = -q1, -d
    if d > 0.9995:
        q = q0 + s * (q1 - q0)
        return q / np.linalg.norm(q)
    th = np.arccos(np.clip(d, -1.0, 1.0))
    return (np.sin((1 - s) * th) * q0 + np.sin(s * th) * q1) / np.sin(th)


class _Transform:
    """Static or animated T.R.S transform (instance.rs:43-54).  Animated
    interpolation = translation lerp + quaternion slerp + scale lerp
    (decomposed_transform.rs:17-24): the reference decomposes the
    composed matrices, which for component-built T.R.S (positive scale)
    recovers exactly the components lerped here."""

    def __init__(self, tf):
        if not tf:
            self.animated = False
            self.comp0 = _components({})
        elif "static" in tf:
            self.animated = False
            self.comp0 = _components(tf["static"])
        elif "animated" in tf:
            self.animated = True
            self.comp0 = _components(tf["animated"][0])
            self.comp1 = _components(tf["animated"][1])
        else:
            raise ValueError(f"oracle: unknown transform {tf}")

    def matrix(self, t=0.0):
        if not self.animated:
            tr, q, sc = self.comp0
        else:
            s = float(t)
            tr = (1 - s) * self.comp0[0] + s * self.comp1[0]
            q = _slerp(self.comp0[1], self.comp1[1], s)
            sc = (1 - s) * self.comp0[2] + s * self.comp1[2]
        m = np.eye(4)
        m[:3, :3] = _quat_matrix(q) @ np.diag(sc)
        m[:3, 3] = tr
        return m


def _load_image_srgb(path):
    """Decode an image file to linear f64 [h,w,3] with the IEC sRGB EOTF
    (R8G8B8A8_SRGB semantics, image_texture.rs:105)."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), np.float64) / 255.0
    return np.where(arr <= 0.04045, arr / 12.92,
                    ((arr + 0.055) / 1.055) ** 2.4)


class _Geo:
    """World-space geometry snapshot at one shutter time."""
    pass


class OracleScene:
    def __init__(self, path):
        doc = json.load(open(path))
        base = os.path.dirname(os.path.abspath(path))

        self.textures = {}
        for t in doc["textures"]:
            kind = next(iter(t))
            body = t[kind]
            name = body["name"]
            if kind == "constant":
                self.textures[name] = ("constant",
                                       np.asarray(body["rgb"], np.float64))
            elif kind == "image":
                p = body["path"]
                if not os.path.isabs(p):
                    p = os.path.join(base, p)
                img = _load_image_srgb(p)
                self.textures[name] = ("image", img,
                                       img.shape[1], img.shape[0])
            elif kind == "checker":
                self.textures[name] = ("checker", float(body["scale"]),
                                       body["even"], body["odd"])
            elif kind == "noise":
                self.textures[name] = ("noise", float(body["scale"]))
            else:
                raise ValueError(f"oracle: unsupported texture {kind}")

        self.materials = {}
        for m in doc["materials"]:
            kind = next(iter(m))
            body = m[kind]
            if kind == "lambertian":
                mat = ("lambertian", body["albedo"])
            elif kind == "metal":
                mat = ("metal", body["albedo"], body["fuzz"])
            elif kind == "dielectric":
                mat = ("dielectric", float(body["refraction_index"]))
            elif kind == "diffuse_light":
                mat = ("diffuse_light", body["emit"])
            else:
                raise ValueError(f"oracle: unsupported material {kind}")
            self.materials[body["name"]] = mat

        prims = {}
        for p in doc["primitives"]:
            kind = next(iter(p))
            prims[p[kind]["name"]] = (kind, p[kind])

        # Flatten instances: spheres first, then triangles, preserving
        # instance order within each class (the engine's table order).
        self.spheres = []   # (c_obj, r_obj, mat, _Transform)
        self.tris = []      # (v0,v1,v2 obj, n_obj, uv0,uv1,uv2, mat, _Transform)
        self.animated = False
        for inst in doc["instances"]:
            xf = _Transform(inst.get("transform"))
            self.animated |= xf.animated
            kind, body = prims[inst["name"]]
            mat = self.materials[body["material"]]
            if kind == "uv_sphere":
                self.spheres.append((np.asarray(body["center"], np.float64),
                                     float(body["radius"]), mat, xf))
            elif kind == "triangle":
                pts = [np.asarray(q, np.float64) for q in body["points"]]
                uvs = [np.asarray(q, np.float64)
                       for q in body.get("uv") or [[0, 0]] * 3]
                self.tris.append((pts[0], pts[1], pts[2],
                                  np.asarray(body["normal"], np.float64),
                                  uvs[0], uvs[1], uvs[2], mat, xf))
            elif kind == "quad":
                for tq in _quad_tris(body["points"], body["normal"],
                                     body.get("uv")):
                    self.tris.append((tq[0], tq[1], tq[2], tq[3],
                                      tq[4][0], tq[4][1], tq[4][2], mat, xf))
            elif kind == "box":
                for tq in _box_tris(*body["corners"]):
                    self.tris.append((tq[0], tq[1], tq[2], tq[3],
                                      tq[4][0], tq[4][1], tq[4][2], mat, xf))
            else:
                raise ValueError(f"oracle: unsupported primitive {kind}")

        self.mats = ([s[2] for s in self.spheres]
                     + [t[7] for t in self.tris])
        self._geo_cache = {}

        sky = doc["sky"]
        if "solid" in sky:
            self.sky = np.asarray(sky["solid"]["rgb"], np.float64)
        else:
            g = sky["vertical_gradient"]
            f = float(g["factor"])
            # Quirk #1: the gradient ignores ray direction entirely.
            self.sky = ((1.0 - f) * np.asarray(g["top"], np.float64)
                        + f * np.asarray(g["bottom"], np.float64))

        # Emissive light triangles for NEE.  Lights must be static
        # (light.rs:63-68), so areas are time-invariant.  The table holds
        # OBJECT-space triangles (quirk #2 applies the HIT instance's o2w
        # at sampling time); areas are world-space (light.rs:63), with the
        # degenerate-area cutoff (light.rs:81-88).  Emissive uv_spheres
        # contribute their TESSELLATED triangles (light.rs collects every
        # light mesh's triangles; the engine does the same even though it
        # traces spheres analytically), independently re-derived from
        # mesh.rs:155-258.
        lv0, lv1, lv2, areas = [], [], [], []
        for inst in doc["instances"]:
            xf = _Transform(inst.get("transform"))
            kind, body = prims[inst["name"]]
            mat = self.materials[body["material"]]
            if mat[0] != "diffuse_light":
                continue
            if xf.animated:
                raise ValueError("oracle: animated light (light.rs:63-68)")
            if kind == "uv_sphere":
                otris = _uv_sphere_light_tris(
                    np.asarray(body["center"], np.float64),
                    float(body["radius"]),
                    int(body["rings"]), int(body["segments"]))
            elif kind == "triangle":
                otris = np.asarray(body["points"],
                                   np.float64).reshape(1, 3, 3)
            elif kind == "quad":
                otris = np.stack(
                    [np.stack(tq[:3]) for tq in _quad_tris(
                        body["points"], body["normal"], body.get("uv"))])
            elif kind == "box":
                otris = np.stack(
                    [np.stack(tq[:3]) for tq in _box_tris(*body["corners"])])
            else:
                raise ValueError(f"oracle: unsupported light prim {kind}")
            m = xf.matrix(0.0)
            w = otris @ m[:3, :3].T + m[:3, 3]
            a = 0.5 * np.linalg.norm(
                np.cross(w[:, 1] - w[:, 0], w[:, 2] - w[:, 0]), axis=-1)
            keep = a > 1e-8
            lv0.append(otris[keep, 0])
            lv1.append(otris[keep, 1])
            lv2.append(otris[keep, 2])
            areas.append(a[keep])
        if areas:
            self.light_v0o = np.concatenate(lv0)
            self.light_v1o = np.concatenate(lv1)
            self.light_v2o = np.concatenate(lv2)
            self.light_areas = np.concatenate(areas)
        else:
            self.light_v0o = np.zeros((0, 3))
            self.light_v1o = np.zeros((0, 3))
            self.light_v2o = np.zeros((0, 3))
            self.light_areas = np.zeros(0)
        self.light_total_area = float(self.light_areas.sum())

        cam = None
        for c in doc["cameras"]:
            body = c[next(iter(c))]
            if body["name"] == doc["render"]["camera"]:
                cam = body
        self.camera = cam
        self.render = doc["render"]

    def geometry_at(self, t):
        """World-space arrays at shutter time t (cached)."""
        key = round(float(t), 12)
        if key in self._geo_cache:
            return self._geo_cache[key]
        g = _Geo()
        ns = len(self.spheres)
        nt = len(self.tris)
        g.sph_c = np.zeros((ns, 3))
        g.sph_r = np.zeros(ns)
        g.sph_w2o = np.zeros((ns, 4, 4))
        g.sph_c_obj = np.zeros((ns, 3))
        g.sph_r_obj = np.zeros(ns)
        xfs = []
        for i, (c, r, _m, xf) in enumerate(self.spheres):
            m = xf.matrix(t)
            scale = np.linalg.norm(m[:3, :3], axis=0)
            if not np.allclose(scale, scale[0]):
                raise ValueError("oracle: non-uniform sphere scale")
            g.sph_c[i] = m[:3, :3] @ c + m[:3, 3]
            g.sph_r[i] = r * scale[0]
            g.sph_w2o[i] = np.linalg.inv(m)
            g.sph_c_obj[i] = c
            g.sph_r_obj[i] = r
            xfs.append(m)
        g.tri_v0 = np.zeros((nt, 3))
        g.tri_e1 = np.zeros((nt, 3))
        g.tri_e2 = np.zeros((nt, 3))
        g.tri_n = np.zeros((nt, 3))
        g.tri_uv0 = np.zeros((nt, 2))
        g.tri_duv1 = np.zeros((nt, 2))
        g.tri_duv2 = np.zeros((nt, 2))
        g.tri_obj_v0 = np.zeros((nt, 3))
        g.tri_obj_v1 = np.zeros((nt, 3))
        g.tri_obj_v2 = np.zeros((nt, 3))
        tri_xfs = []
        for j, (p0, p1, p2, nrm, uv0, uv1, uv2, _m, xf) in enumerate(
                self.tris):
            m = xf.matrix(t)
            w0 = m[:3, :3] @ p0 + m[:3, 3]
            g.tri_v0[j] = w0
            g.tri_e1[j] = (m[:3, :3] @ p1 + m[:3, 3]) - w0
            g.tri_e2[j] = (m[:3, :3] @ p2 + m[:3, 3]) - w0
            nw = m[:3, :3] @ nrm
            g.tri_n[j] = nw / np.linalg.norm(nw)
            g.tri_uv0[j] = uv0
            g.tri_duv1[j] = uv1 - uv0
            g.tri_duv2[j] = uv2 - uv0
            g.tri_obj_v0[j], g.tri_obj_v1[j], g.tri_obj_v2[j] = p0, p1, p2
            tri_xfs.append(m)
        # Per-primitive objectToWorld, spheres first (quirk #2: NEE
        # transforms the light triangle by the HIT instance's o2w —
        # ray_gen.glsl:516 + :273-276).
        g.prim_xf = np.array(xfs + tri_xfs if (xfs or tri_xfs)
                             else []).reshape(-1, 4, 4)
        self._geo_cache[key] = g
        return g

    # ------------------------------------------------------- textures

    def eval_basic(self, name, p, u, v):
        tex = self.textures[name]
        if tex[0] == "constant":
            return np.broadcast_to(tex[1], (p.shape[0], 3)).copy()
        if tex[0] == "image":
            img, w, h = tex[1], tex[2], tex[3]
            # Nearest + repeat (vulkano default sampler,
            # render_engine.rs:241-247).
            x = np.clip(np.floor((u % 1.0) * w), 0, w - 1).astype(np.int64)
            y = np.clip(np.floor((v % 1.0) * h), 0, h - 1).astype(np.int64)
            return img[y, x]
        if tex[0] == "noise":
            scale = tex[1]
            return 0.5 * (1.0 + np.sin(
                scale * p[:, 2] + 10.0 * _turbulence(p, 7)))[:, None] \
                * np.ones((1, 3))
        raise ValueError(f"oracle: {name} is not a basic texture")

    def eval_texture(self, name, p, u, v):
        """ray_gen.glsl:184-243 getMaterialPropertyValue."""
        tex = self.textures[name]
        if tex[0] == "checker":
            scale, even, odd = tex[1], tex[2], tex[3]
            inv = 1.0 / scale
            xi = np.floor(inv * p[:, 0]).astype(np.int64)
            yi = np.floor(inv * p[:, 1]).astype(np.int64)
            zi = np.floor(inv * p[:, 2]).astype(np.int64)
            is_even = (xi + yi + zi) % 2 == 0
            ev = self.eval_basic(even, p, u, v)
            od = self.eval_basic(odd, p, u, v)
            return np.where(is_even[:, None], ev, od)
        return self.eval_basic(name, p, u, v)


# ---------------------------------------------------------------- camera

def _look_at_rh(eye, center, up):
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4)
    m[0, :3], m[1, :3], m[2, :3] = s, u, -f
    m[0, 3], m[1, 3], m[2, 3] = -s @ eye, -u @ eye, f @ eye
    return m


def _perspective_rh(fovy, aspect, znear, zfar):
    h = 1.0 / np.tan(0.5 * fovy)
    w = h / aspect
    m = np.zeros((4, 4))
    m[0, 0], m[1, 1] = w, h
    m[2, 2] = zfar / (znear - zfar)
    m[2, 3] = -(zfar * znear) / (zfar - znear)
    m[3, 2] = -1.0
    return m


def _disk_concentric(n, rng):
    """sampleUniformDiskConcentric (common.glsl:353-373)."""
    u = 2.0 * rng.random((n, 2)) - 1.0
    ax, ay = np.abs(u[:, 0]), np.abs(u[:, 1])
    x_major = ax > ay
    r = np.where(x_major, u[:, 0], u[:, 1])
    safe = lambda a, b: a / np.where(b == 0.0, 1.0, b)
    theta = np.where(x_major,
                     (np.pi / 4) * safe(u[:, 1], u[:, 0]),
                     (np.pi / 2) - (np.pi / 4) * safe(u[:, 0], u[:, 1]))
    pt = r[:, None] * np.stack([np.cos(theta), np.sin(theta)], -1)
    return np.where((u == 0.0).all(axis=1)[:, None], 0.0, pt)


def camera_rays(scene, width, height, rng):
    """Primary rays incl. the thin-lens DOF quirk (ray_gen.glsl:543-571):
    the lens offset is added to the WORLD-space origin's xy components,
    scaled by the NDC coordinate d."""
    cam = scene.camera
    eye = np.asarray(cam["eye"], np.float64)
    view = _look_at_rh(eye, np.asarray(cam["look_at"], np.float64),
                       np.asarray(cam["up"], np.float64))
    proj = _perspective_rh(np.deg2rad(cam["fov_y"]), width / height,
                           cam["z_near"], cam["z_far"])
    iv, ip = np.linalg.inv(view), np.linalg.inv(proj)

    n = width * height
    px = np.tile(np.arange(width), height)
    py = np.repeat(np.arange(height), width)
    u = (px + rng.random(n)) / width * 2.0 - 1.0
    v = (py + rng.random(n)) / height * 2.0 - 1.0
    ndc = np.stack([u, v, np.ones(n), np.ones(n)], axis=-1)
    target = ndc @ ip.T
    t3 = target[:, :3]
    t3 = t3 / np.linalg.norm(t3, axis=-1, keepdims=True)
    d = (np.concatenate([t3, np.zeros((n, 1))], axis=-1) @ iv.T)[:, :3]
    o = np.broadcast_to(eye, (n, 3)).copy()

    aperture = float(cam.get("aperture_size") or 0.0)
    if aperture > 0.0:
        focal = float(cam["focal_length"])
        fp = np.concatenate([focal * t3, np.ones((n, 1))], axis=-1) @ iv.T
        lens = _disk_concentric(n, rng) * (aperture / 2.0)
        o[:, 0] += lens[:, 0] * u
        o[:, 1] += lens[:, 1] * v
        d = fp[:, :3] - o
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


# ------------------------------------------------------------- tracing

def closest_hit(geo, o, d):
    """Returns (t, prim_id, bary_u, bary_v) — spheres first then
    triangles, lowest id wins ties, like the engine's ascending sweep."""
    n = o.shape[0]
    best_t = np.full(n, T_MAX)
    best_id = np.full(n, -1, np.int64)
    best_u = np.zeros(n)
    best_v = np.zeros(n)

    for i in range(geo.sph_c.shape[0]):
        oc = o - geo.sph_c[i]
        a = np.sum(d * d, axis=-1)
        h = np.sum(d * oc, axis=-1)
        c = np.sum(oc * oc, axis=-1) - geo.sph_r[i] ** 2
        disc = h * h - a * c
        sq = np.sqrt(np.maximum(disc, 0.0))
        t1 = (-h - sq) / a
        t2 = (-h + sq) / a
        ok = disc >= 0.0
        t = np.where(ok & (t1 > T_MIN) & (t1 < T_MAX), t1,
                     np.where(ok & (t2 > T_MIN) & (t2 < T_MAX), t2, T_MAX))
        better = t < best_t
        best_t = np.where(better, t, best_t)
        best_id = np.where(better, i, best_id)

    ns = geo.sph_c.shape[0]
    for j in range(geo.tri_v0.shape[0]):
        e1, e2, v0 = geo.tri_e1[j], geo.tri_e2[j], geo.tri_v0[j]
        p = np.cross(d, e2)
        det = p @ e1
        inv = np.where(det != 0.0, 1.0 / np.where(det == 0.0, 1.0, det), 0.0)
        tv = o - v0
        uu = np.sum(tv * p, axis=-1) * inv
        q = np.cross(tv, np.broadcast_to(e1, tv.shape))
        vv = np.sum(d * q, axis=-1) * inv
        t = (q @ e2) * inv
        ok = ((det != 0.0) & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
              & (t > T_MIN) & (t < T_MAX))
        t = np.where(ok, t, T_MAX)
        better = t < best_t
        best_t = np.where(better, t, best_t)
        best_id = np.where(better, ns + j, best_id)
        best_u = np.where(better, uu, best_u)
        best_v = np.where(better, vv, best_v)
    return best_t, best_id, best_u, best_v


def _normals_uv(scene, geo, prim, hp, bu, bv):
    """Geometric normal + texture UV per hit.  Sphere UV from the
    object-space normal (the analytic inverse of mesh.rs:155-179's
    tessellation parameterization): v = acos(-n.y)/pi,
    u = atan2(n.z, -n.x)/2pi mod 1."""
    n = np.zeros_like(hp)
    uu = np.zeros(hp.shape[0])
    vv = np.zeros(hp.shape[0])
    ns = geo.sph_c.shape[0]
    for i in range(ns):
        sel = prim == i
        if sel.any():
            n[sel] = (hp[sel] - geo.sph_c[i]) / geo.sph_r[i]
            w2o = geo.sph_w2o[i]
            p_obj = hp[sel] @ w2o[:3, :3].T + w2o[:3, 3]
            n_obj = (p_obj - geo.sph_c_obj[i]) / geo.sph_r_obj[i]
            n_obj = n_obj / np.linalg.norm(n_obj, axis=-1, keepdims=True)
            vv[sel] = np.arccos(np.clip(-n_obj[:, 1], -1.0, 1.0)) / np.pi
            uu[sel] = (np.arctan2(n_obj[:, 2], -n_obj[:, 0])
                       / (2 * np.pi)) % 1.0
    for j in range(geo.tri_v0.shape[0]):
        sel = prim == ns + j
        if sel.any():
            # Declared (tessellation) normal — the engine's shading and
            # front-face logic uses vertex normals, not cross products.
            n[sel] = geo.tri_n[j]
            uv = (geo.tri_uv0[j] + bu[sel, None] * geo.tri_duv1[j]
                  + bv[sel, None] * geo.tri_duv2[j])
            uu[sel] = uv[:, 0]
            vv[sel] = uv[:, 1]
    return n, uu, vv


def _cosine_dir(normal, rng):
    n = normal.shape[0]
    r1, r2 = rng.random(n), rng.random(n)
    phi = 2 * np.pi * r1
    x = np.cos(phi) * np.sqrt(r2)
    y = np.sin(phi) * np.sqrt(r2)
    z = np.sqrt(1 - r2)
    # ONB around normal
    a = np.where(np.abs(normal[:, 0:1]) > 0.9, [0.0, 1.0, 0.0],
                 [1.0, 0.0, 0.0])
    v = np.cross(normal, a)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    u = np.cross(normal, v)
    return (x[:, None] * u + y[:, None] * v + z[:, None] * normal)


def _unit_sphere(n, rng):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def render_oracle(path, width, height, spp, max_depth=None, seed=7,
                  times=None):
    """Render `spp` samples per pixel per shutter time, averaged over
    `times` (default: the static scene at t=0).  For motion-blur scenes
    pass the engine's batch ray times so both renderers integrate the
    same shutter distribution."""
    scene = OracleScene(path)
    if times is None:
        if scene.animated:
            raise ValueError("oracle: animated scene needs explicit times")
        times = [0.0]
    rng = np.random.default_rng(seed)
    depth_cap = max_depth or int(scene.render["max_ray_depth"])
    n = width * height
    img = np.zeros((n, 3))
    has_lights = scene.light_total_area > 0.0

    mat_ids = np.array(
        [{"lambertian": 0, "metal": 1, "dielectric": 2,
          "diffuse_light": 3}[m[0]] for m in scene.mats], np.int64)

    for tm in times:
        geo = scene.geometry_at(tm)
        for _ in range(spp):
            o, d = camera_rays(scene, width, height, rng)
            thr = np.ones((n, 3))
            acc = np.zeros((n, 3))
            alive = np.ones(n, bool)
            for _depth in range(depth_cap):
                t, prim, bu, bv = closest_hit(geo, o, d)
                missed = alive & (t >= T_MAX)
                acc[missed] += thr[missed] * scene.sky
                hit = alive & ~missed
                if not hit.any():
                    break
                hp = o + t[:, None] * d
                safe_prim = np.where(hit, prim, 0)
                gn, tu, tv = _normals_uv(scene, geo, safe_prim, hp, bu, bv)
                front = np.sum(d * gn, axis=-1) < 0.0
                nrm = np.where(front[:, None], gn, -gn)
                mt = mat_ids[safe_prim]

                # Emission (front faces only), emit texture evaluated at
                # the hit.
                for i, m in enumerate(scene.mats):
                    if m[0] == "diffuse_light":
                        sel = hit & (prim == i) & front
                        if sel.any():
                            acc[sel] += thr[sel] * scene.eval_texture(
                                m[1], hp[sel], tu[sel], tv[sel])

                new_d = np.zeros_like(d)
                new_thr = thr.copy()
                scattered = np.zeros(n, bool)

                # Lambertian: cosine scatter or MIS mixture.
                lam = hit & (mt == 0)
                if lam.any():
                    alb = np.zeros((n, 3))
                    for i, m in enumerate(scene.mats):
                        if m[0] == "lambertian":
                            sel = lam & (prim == i)
                            if sel.any():
                                alb[sel] = scene.eval_texture(
                                    m[1], hp[sel], tu[sel], tv[sel])
                    if has_lights:
                        # light sample: area-weighted triangle, uniform
                        # point; quirk #2: the OBJECT-space light triangle
                        # is taken through the HIT instance's o2w.
                        li = rng.choice(len(scene.light_areas), size=n,
                                        p=scene.light_areas
                                        / scene.light_total_area)
                        r1 = rng.random(n)
                        r2 = rng.random(n)
                        sq = np.sqrt(r1)
                        b0, b1 = 1 - sq, sq * r2
                        hx = geo.prim_xf[safe_prim]
                        rot = hx[:, :3, :3]
                        trn = hx[:, :3, 3]

                        def _w(v):
                            return np.einsum("nij,nj->ni", rot, v) + trn

                        w0 = _w(scene.light_v0o[li])
                        w1 = _w(scene.light_v1o[li])
                        w2 = _w(scene.light_v2o[li])
                        e1, e2 = w1 - w0, w2 - w0
                        lpos = w0 + b0[:, None] * e1 + b1[:, None] * e2
                        lnrm = np.cross(e1, e2)
                        lnrm /= np.linalg.norm(lnrm, axis=-1, keepdims=True)
                        use_light = rng.random(n) < 0.5
                        cos_d = _cosine_dir(nrm, rng)
                        ldir = lpos - hp
                        sdir = np.where(use_light[:, None], ldir, cos_d)
                        sn = sdir / np.maximum(
                            np.linalg.norm(sdir, axis=-1, keepdims=True),
                            1e-300)
                        pdf_cos = np.maximum(
                            0.0, np.sum(sn * nrm, axis=-1) / np.pi)
                        d2 = np.sum(sdir * sdir, axis=-1)
                        cos_l = np.abs(np.sum(lnrm * -sn, axis=-1))
                        pdf_light = np.where(
                            cos_l > 0.0,
                            d2 / np.maximum(cos_l, 1e-300)
                            / scene.light_total_area, 0.0)
                        pdf_val = 0.5 * pdf_light + 0.5 * pdf_cos
                        ratio = np.where(
                            pdf_val > 0.0,
                            pdf_cos / np.where(pdf_val == 0.0, 1.0, pdf_val),
                            0.0)
                        new_thr = np.where(
                            lam[:, None], thr * alb * ratio[:, None],
                            new_thr)
                        new_d = np.where(lam[:, None], sn, new_d)
                        scattered |= lam  # lambertian always scatters
                    else:
                        cd = _cosine_dir(nrm, rng)
                        new_d = np.where(lam[:, None], cd, new_d)
                        new_thr = np.where(lam[:, None], thr * alb, new_thr)
                        scattered |= lam

                # Metal.
                met = hit & (mt == 1)
                if met.any():
                    alb = np.zeros((n, 3))
                    fuz = np.zeros((n, 3))
                    for i, m in enumerate(scene.mats):
                        if m[0] == "metal":
                            sel = met & (prim == i)
                            if sel.any():
                                alb[sel] = scene.eval_texture(
                                    m[1], hp[sel], tu[sel], tv[sel])
                                fuz[sel] = scene.eval_texture(
                                    m[2], hp[sel], tu[sel], tv[sel])
                    refl = (d - 2 * np.sum(d * nrm, axis=-1, keepdims=True)
                            * nrm)
                    rn = refl / np.linalg.norm(refl, axis=-1, keepdims=True)
                    fd = rn + fuz * _unit_sphere(n, rng)
                    ok = np.sum(refl * nrm, axis=-1) > 0
                    new_d = np.where(met[:, None], fd, new_d)
                    new_thr = np.where(met[:, None], thr * alb, new_thr)
                    scattered |= met & ok

                # Dielectric.
                die = hit & (mt == 2)
                if die.any():
                    ri_tab = np.ones(n)
                    for i, m in enumerate(scene.mats):
                        if m[0] == "dielectric":
                            ri_tab[die & (prim == i)] = m[1]
                    ri = np.where(front, 1.0 / ri_tab, ri_tab)
                    ud = d / np.linalg.norm(d, axis=-1, keepdims=True)
                    ct = np.minimum(np.sum(-ud * nrm, axis=-1), 1.0)
                    st = np.sqrt(np.maximum(1 - ct * ct, 0.0))
                    r0 = ((1 - ri) / (1 + ri)) ** 2
                    schlick = r0 + (1 - r0) * (1 - ct) ** 5
                    cannot = (ri * st > 1.0) | (schlick > rng.random(n))
                    refl = (ud - 2 * np.sum(ud * nrm, axis=-1, keepdims=True)
                            * nrm)
                    perp = ri[:, None] * (ud + ct[:, None] * nrm)
                    par = -np.sqrt(np.abs(
                        1.0 - np.sum(perp * perp, axis=-1)))[:, None] * nrm
                    refr = perp + par
                    nd = np.where(cannot[:, None], refl, refr)
                    new_d = np.where(die[:, None], nd, new_d)
                    scattered |= die

                cont = scattered
                nn = np.maximum(
                    np.linalg.norm(new_d, axis=-1, keepdims=True), 1e-300)
                o = np.where(cont[:, None], hp, o)
                d = np.where(cont[:, None], new_d / nn, d)
                thr = np.where(cont[:, None], new_thr, thr)
                alive = cont
                if not alive.any():
                    break
            img += acc
    return (img / (spp * len(times))).reshape(height, width, 3)
