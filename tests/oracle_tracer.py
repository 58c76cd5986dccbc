"""Independent brute-force path tracer — the correctness oracle.

A deliberately boring numpy/f64 renderer with NO imports from
raytrace_tpu: it reads the scene JSON directly and implements the
estimator from the reference's GLSL spec (ray_gen.glsl:457-541 bounce
loop, :252-341 NEE/MIS, :543-571 camera) and the documented quirks
(gradient sky ignores direction, emission front-face only, tMin=1e-3 /
tMax=1e4).  Agreement between this and the engine converts "the engine
agrees with itself" into "the engine agrees with an independent
implementation of the physics" (tests/test_oracle.py).

Supported: analytic uv_spheres (the engine's default geometry mode),
triangle/quad/box primitives, constant textures, lambertian / metal /
dielectric / diffuse_light materials, solid + vertical-gradient sky,
area-light NEE with the 50/50 mixture MIS.  No motion blur, no DOF, no
image/checker/noise textures — pick test scenes accordingly.
"""

from __future__ import annotations

import json

import numpy as np

T_MIN, T_MAX = 1e-3, 1e4


# ----------------------------------------------------------------- scene

def _quad_tris(points, normal):
    p = [np.asarray(q, np.float64) for q in points]
    n = np.asarray(normal, np.float64)
    return [(p[0], p[1], p[2], n), (p[0], p[2], p[3], n)]


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


def _static_matrix(tf):
    """Instance transform -> 4x4 (T.R.S order, instance.rs:43-54).
    Animated transforms are out of the oracle's scope."""
    m = np.eye(4)
    if not tf:
        return m
    if "static" not in tf:
        raise ValueError("oracle: animated transforms unsupported")
    t = tf["static"]
    if t.get("scale"):
        m[:3, :3] = np.diag(t["scale"])
    if t.get("rotate"):
        ax = np.asarray(t["rotate"]["axis"], np.float64)
        ax = ax / np.linalg.norm(ax)
        th = np.deg2rad(t["rotate"]["degrees"])
        k = np.array([[0, -ax[2], ax[1]],
                      [ax[2], 0, -ax[0]],
                      [-ax[1], ax[0], 0]])
        r = np.eye(3) + np.sin(th) * k + (1 - np.cos(th)) * (k @ k)
        m[:3, :3] = r @ m[:3, :3]
    if t.get("translate"):
        m[:3, 3] = t["translate"]
    return m


class OracleScene:
    def __init__(self, path):
        doc = json.load(open(path))
        tex = {}
        for t in doc["textures"]:
            kind = next(iter(t))
            body = t[kind]
            if kind != "constant":
                raise ValueError(f"oracle: unsupported texture {kind}")
            tex[body["name"]] = np.asarray(body["rgb"], np.float64)

        self.materials = {}
        for m in doc["materials"]:
            kind = next(iter(m))
            body = m[kind]
            if kind == "lambertian":
                mat = ("lambertian", tex[body["albedo"]])
            elif kind == "metal":
                mat = ("metal", tex[body["albedo"]], tex[body["fuzz"]])
            elif kind == "dielectric":
                mat = ("dielectric", float(body["refraction_index"]))
            elif kind == "diffuse_light":
                mat = ("diffuse_light", tex[body["emit"]])
            else:
                raise ValueError(f"oracle: unsupported material {kind}")
            self.materials[body["name"]] = mat

        prims = {}
        for p in doc["primitives"]:
            kind = next(iter(p))
            prims[p[kind]["name"]] = (kind, p[kind])

        spheres = []       # (center, radius, mat)
        tris = []          # (v0, v1, v2, declared shading normal, mat)
        xfs = []           # per-prim instance objectToWorld (spheres first)
        tri_xfs = []
        tris_obj = []      # object-space (v0, v1, v2) per world tri
        for inst in doc["instances"]:
            xf = _static_matrix(inst.get("transform"))
            kind, body = prims[inst["name"]]
            mat = self.materials[body["material"]]

            def ap(p):
                return xf[:3, :3] @ np.asarray(p, np.float64) + xf[:3, 3]

            def apn(nv):
                n = xf[:3, :3] @ np.asarray(nv, np.float64)
                return n / np.linalg.norm(n)

            if kind == "uv_sphere":
                scale = np.linalg.norm(xf[:3, :3], axis=0)
                if not np.allclose(scale, scale[0]):
                    raise ValueError("oracle: non-uniform sphere scale")
                spheres.append((ap(body["center"]),
                                float(body["radius"]) * scale[0], mat))
                xfs.append(xf)
            elif kind == "triangle":
                pts = [np.asarray(q, np.float64) for q in body["points"]]
                tris.append((ap(pts[0]), ap(pts[1]), ap(pts[2]),
                             apn(body["normal"]), mat))
                tris_obj.append((pts[0], pts[1], pts[2]))
                tri_xfs.append(xf)
            elif kind == "quad":
                for t in _quad_tris(
                        [np.asarray(q, np.float64) for q in body["points"]],
                        body["normal"]):
                    tris.append((ap(t[0]), ap(t[1]), ap(t[2]),
                                 apn(t[3]), mat))
                    tris_obj.append((t[0], t[1], t[2]))
                    tri_xfs.append(xf)
            elif kind == "box":
                for t in _box_tris(*body["corners"]):
                    tris.append((ap(t[0]), ap(t[1]), ap(t[2]),
                                 apn(t[3]), mat))
                    tris_obj.append((t[0], t[1], t[2]))
                    tri_xfs.append(xf)
            else:
                raise ValueError(f"oracle: unsupported primitive {kind}")

        self.sph_c = np.array([s[0] for s in spheres]).reshape(-1, 3)
        self.sph_r = np.array([s[1] for s in spheres]).reshape(-1)
        self.sph_mat = [s[2] for s in spheres]
        self.tri_v0 = np.array([t[0] for t in tris]).reshape(-1, 3)
        self.tri_e1 = (np.array([t[1] for t in tris]).reshape(-1, 3)
                       - self.tri_v0)
        self.tri_e2 = (np.array([t[2] for t in tris]).reshape(-1, 3)
                       - self.tri_v0)
        self.tri_n = np.array([t[3] for t in tris]).reshape(-1, 3)
        self.tri_mat = [t[4] for t in tris]
        self.mats = self.sph_mat + self.tri_mat
        # Per-primitive objectToWorld, spheres first (quirk #2: NEE
        # transforms the light triangle by the HIT instance's o2w —
        # ray_gen.glsl:516 + :273-276).
        self.prim_xf = np.array(
            xfs + tri_xfs if (xfs or tri_xfs) else []).reshape(-1, 4, 4)
        self.tri_obj_v0 = np.array(
            [t[0] for t in tris_obj]).reshape(-1, 3)
        self.tri_obj_v1 = np.array(
            [t[1] for t in tris_obj]).reshape(-1, 3)
        self.tri_obj_v2 = np.array(
            [t[2] for t in tris_obj]).reshape(-1, 3)

        sky = doc["sky"]
        if "solid" in sky:
            self.sky = np.asarray(sky["solid"]["rgb"], np.float64)
        else:
            g = sky["vertical_gradient"]
            f = float(g["factor"])
            # Quirk #1: the gradient ignores ray direction entirely.
            self.sky = ((1.0 - f) * np.asarray(g["top"], np.float64)
                        + f * np.asarray(g["bottom"], np.float64))

        # Emissive light triangles for NEE (world space).
        self.light_tris = [i for i, m in enumerate(self.tri_mat)
                           if m[0] == "diffuse_light"]
        areas = []
        for i in self.light_tris:
            a = 0.5 * np.linalg.norm(
                np.cross(self.tri_e1[i], self.tri_e2[i]))
            areas.append(a)
        self.light_areas = np.asarray(areas, np.float64)
        self.light_total_area = float(self.light_areas.sum()) if areas else 0.0

        cam = None
        for c in doc["cameras"]:
            body = c[next(iter(c))]
            if body["name"] == doc["render"]["camera"]:
                cam = body
        self.camera = cam
        self.render = doc["render"]


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


def camera_rays(scene, width, height, rng):
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
    d = np.concatenate([t3, np.zeros((n, 1))], axis=-1) @ iv.T
    o = np.broadcast_to(eye, (n, 3)).copy()
    return o, d[:, :3]


# ------------------------------------------------------------- tracing

def closest_hit(scene, o, d):
    """Returns (t, prim_id) — spheres first then triangles, lowest id wins
    ties, like the engine's ascending sweep."""
    n = o.shape[0]
    best_t = np.full(n, T_MAX)
    best_id = np.full(n, -1, np.int64)

    for i in range(scene.sph_c.shape[0]):
        oc = o - scene.sph_c[i]
        a = np.sum(d * d, axis=-1)
        h = np.sum(d * oc, axis=-1)
        c = np.sum(oc * oc, axis=-1) - scene.sph_r[i] ** 2
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

    ns = scene.sph_c.shape[0]
    for j in range(scene.tri_v0.shape[0]):
        e1, e2, v0 = scene.tri_e1[j], scene.tri_e2[j], scene.tri_v0[j]
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
    return best_t, best_id


def _normals(scene, prim, hp):
    n = np.zeros_like(hp)
    ns = scene.sph_c.shape[0]
    for i in range(ns):
        sel = prim == i
        if sel.any():
            n[sel] = (hp[sel] - scene.sph_c[i]) / scene.sph_r[i]
    for j in range(scene.tri_v0.shape[0]):
        sel = prim == ns + j
        if sel.any():
            # Declared (tessellation) normal — the engine's shading and
            # front-face logic uses vertex normals, not cross products.
            n[sel] = scene.tri_n[j]
    return n


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


def render_oracle(path, width, height, spp, max_depth=None, seed=7):
    scene = OracleScene(path)
    rng = np.random.default_rng(seed)
    depth_cap = max_depth or int(scene.render["max_ray_depth"])
    n = width * height
    img = np.zeros((n, 3))
    has_lights = scene.light_total_area > 0.0

    mat_ids = np.array(
        [{"lambertian": 0, "metal": 1, "dielectric": 2,
          "diffuse_light": 3}[m[0]] for m in scene.mats], np.int64)

    for _ in range(spp):
        o, d = camera_rays(scene, width, height, rng)
        thr = np.ones((n, 3))
        acc = np.zeros((n, 3))
        alive = np.ones(n, bool)
        for _depth in range(depth_cap):
            t, prim = closest_hit(scene, o, d)
            missed = alive & (t >= T_MAX)
            acc[missed] += thr[missed] * scene.sky
            hit = alive & ~missed
            if not hit.any():
                break
            hp = o + t[:, None] * d
            gn = _normals(scene, np.where(hit, prim, 0), hp)
            front = np.sum(d * gn, axis=-1) < 0.0
            nrm = np.where(front[:, None], gn, -gn)
            mt = mat_ids[np.where(hit, prim, 0)]

            # Emission (front faces only).
            emis = np.zeros((n, 3))
            for i, m in enumerate(scene.mats):
                if m[0] == "diffuse_light":
                    sel = hit & (prim == i) & front
                    emis[sel] = m[1]
            acc += np.where(hit[:, None], thr * emis, 0.0)

            new_d = np.zeros_like(d)
            new_thr = thr.copy()
            scattered = np.zeros(n, bool)

            # Lambertian: cosine scatter or MIS mixture.
            lam = hit & (mt == 0)
            if lam.any():
                alb = np.zeros((n, 3))
                for i, m in enumerate(scene.mats):
                    if m[0] == "lambertian":
                        alb[lam & (prim == i)] = m[1]
                if has_lights:
                    # light sample: area-weighted triangle, uniform point;
                    # quirk #2: the OBJECT-space light triangle is taken
                    # through the HIT instance's objectToWorld.
                    li = rng.choice(len(scene.light_tris), size=n,
                                    p=scene.light_areas
                                    / scene.light_total_area)
                    r1 = rng.random(n)
                    r2 = rng.random(n)
                    sq = np.sqrt(r1)
                    b0, b1 = 1 - sq, sq * r2
                    lt = np.array(scene.light_tris)[li]
                    hx = scene.prim_xf[np.where(hit, prim, 0)]
                    rot = hx[:, :3, :3]
                    trn = hx[:, :3, 3]
                    def _w(v):
                        return np.einsum("nij,nj->ni", rot, v) + trn
                    w0 = _w(scene.tri_obj_v0[lt])
                    w1 = _w(scene.tri_obj_v1[lt])
                    w2 = _w(scene.tri_obj_v2[lt])
                    e1, e2 = w1 - w0, w2 - w0
                    lpos = w0 + b0[:, None] * e1 + b1[:, None] * e2
                    lnrm = np.cross(e1, e2)
                    lnrm /= np.linalg.norm(lnrm, axis=-1, keepdims=True)
                    use_light = rng.random(n) < 0.5
                    cos_d = _cosine_dir(nrm, rng)
                    ldir = lpos - hp
                    sdir = np.where(use_light[:, None], ldir, cos_d)
                    sn = sdir / np.maximum(
                        np.linalg.norm(sdir, axis=-1, keepdims=True), 1e-300)
                    pdf_cos = np.maximum(
                        0.0, np.sum(sn * nrm, axis=-1) / np.pi)
                    d2 = np.sum(sdir * sdir, axis=-1)
                    cos_l = np.abs(np.sum(lnrm * -sn, axis=-1))
                    pdf_light = np.where(
                        cos_l > 0.0,
                        d2 / np.maximum(cos_l, 1e-300)
                        / scene.light_total_area, 0.0)
                    pdf_val = 0.5 * pdf_light + 0.5 * pdf_cos
                    ratio = np.where(pdf_val > 0.0,
                                     pdf_cos / np.where(pdf_val == 0.0, 1.0,
                                                        pdf_val), 0.0)
                    new_thr = np.where(lam[:, None],
                                       thr * alb * ratio[:, None], new_thr)
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
                        alb[met & (prim == i)] = m[1]
                        fuz[met & (prim == i)] = m[2]
                refl = d - 2 * np.sum(d * nrm, axis=-1, keepdims=True) * nrm
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
                refl = ud - 2 * np.sum(ud * nrm, axis=-1, keepdims=True) * nrm
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
    return (img / spp).reshape(height, width, 3)
