"""Landmark-driven portrait renderer (piecewise-affine warp).

The reference's GeneFace renders talking-head video with a NeRF conditioned
on predicted 3DMM landmarks (``audio_to_face`` — absent from its tree, the
tool crashes on import; SURVEY §7(f): rebuild from the task definition or
substitute, documented). This substitution keeps GeneFace's pipeline shape —
audio → landmark motion → per-frame renderer — but replaces the NeRF with a
TPU-friendly piecewise-affine image warp:

  * a canonical 68-point landmark template (iBUG-68 layout, generated
    procedurally) plus 8 fixed border anchors is Delaunay-triangulated ONCE
    (scipy, at construction — a host-side constant, not traced),
  * every output pixel's (triangle, barycentric) membership is precomputed
    from the template → the per-frame warp is one gather + weighted sum +
    bilinear sample, batched over frames with ``vmap``: no data-dependent
    control flow, MXU/VPU-friendly, one jit program per (T, H, W) bucket.

For small facial motions the backward warp is approximated by inverting the
forward displacement field (``src = dst + Σ bary·(template − frame)``), the
standard small-deformation trick.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Canonical 68-landmark template (iBUG layout), unit-square coordinates
# ---------------------------------------------------------------------------


def template_landmarks() -> np.ndarray:
    """[68, 2] (x, y) in [0, 1]², y down. Procedural neutral face:
    0-16 jaw, 17-21/22-26 brows, 27-35 nose, 36-41/42-47 eyes,
    48-67 mouth (outer 48-59, inner 60-67)."""
    pts = np.zeros((68, 2))
    # jaw: lower half-ellipse, left ear → right ear
    th = np.linspace(np.pi, 2 * np.pi, 17)
    pts[0:17] = np.stack([0.5 + 0.32 * np.cos(th),
                          0.52 - 0.38 * np.sin(th)], 1)
    # brows: shallow arcs
    bx = np.linspace(-0.21, -0.05, 5)
    arch = 0.015 * np.cos(np.linspace(-1.2, 1.2, 5))
    pts[17:22] = np.stack([0.5 + bx, 0.34 - arch], 1)
    pts[22:27] = np.stack([0.5 - bx[::-1], 0.34 - arch[::-1]], 1)
    # nose: bridge (4) + base (5)
    pts[27:31] = np.stack([np.full(4, 0.5), np.linspace(0.38, 0.52, 4)], 1)
    nx = np.linspace(-0.05, 0.05, 5)
    pts[31:36] = np.stack([0.5 + nx, 0.56 - 0.01 * np.abs(nx) / 0.05], 1)
    # eyes: 6-point hexagons
    def eye(cx, cy, w=0.055, h=0.020):
        ex = np.array([-w, -w * 0.45, w * 0.45, w, w * 0.45, -w * 0.45])
        ey = np.array([0.0, -h, -h, 0.0, h, h])
        return np.stack([cx + ex, cy + ey], 1)
    pts[36:42] = eye(0.5 - 0.13, 0.40)
    pts[42:48] = eye(0.5 + 0.13, 0.40)
    # mouth: outer 12, inner 8
    mth = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    pts[48:60] = np.stack([0.5 + 0.085 * np.cos(mth),
                           0.70 + 0.042 * np.sin(mth)], 1)
    ith = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    pts[60:68] = np.stack([0.5 + 0.050 * np.cos(ith),
                           0.70 + 0.018 * np.sin(ith)], 1)
    return pts


def _border_anchors() -> np.ndarray:
    """8 fixed points pinning the warp to zero at the image border."""
    return np.array([[0, 0], [0.5, 0], [1, 0], [0, 0.5], [1, 0.5],
                     [0, 1], [0.5, 1], [1, 1]], np.float64)


class LandmarkWarper:
    """Precomputes the (triangle, barycentric) field for an H×W canvas from
    the canonical template; ``render(portrait, landmarks)`` warps the
    portrait to each frame's landmarks in one jitted program."""

    def __init__(self, height: int = 256, width: int = 256):
        from scipy.spatial import Delaunay

        self.height, self.width = height, width
        tpl = np.concatenate([template_landmarks(), _border_anchors()])
        tri = Delaunay(tpl)
        ys, xs = np.mgrid[0:height, 0:width]
        # pixel coords in unit square (x right, y down)
        q = np.stack([(xs + 0.5) / width, (ys + 0.5) / height],
                     -1).reshape(-1, 2)
        simplex = tri.find_simplex(q)
        simplex = np.maximum(simplex, 0)  # border px → any triangle, bary≈edge
        verts = tri.simplices[simplex]                   # [P, 3]
        T = tri.transform[simplex]                       # [P, 3, 2]
        b2 = np.einsum("pij,pj->pi", T[:, :2], q - T[:, 2])
        bary = np.concatenate([b2, 1.0 - b2.sum(1, keepdims=True)], 1)
        bary = np.clip(bary, 0.0, 1.0)
        bary /= np.maximum(bary.sum(1, keepdims=True), 1e-8)
        self._verts = jnp.asarray(verts.reshape(height, width, 3))
        self._bary = jnp.asarray(bary.reshape(height, width, 3),
                                 jnp.float32)
        self._template = jnp.asarray(tpl, jnp.float32)   # [76, 2]

    @functools.cached_property
    def _render_fn(self):
        H, W = self.height, self.width
        verts, bary, tpl = self._verts, self._bary, self._template

        @jax.jit
        def render(portrait, landmarks):  # [H,W,3] f32, [T,68,2]
            full = jnp.concatenate(
                [landmarks,
                 jnp.broadcast_to(tpl[68:], (landmarks.shape[0], 8, 2))], 1)

            def one(lm):                                  # [76, 2]
                disp = tpl - lm                           # template − frame
                d = disp[verts]                           # [H, W, 3, 2]
                off = (bary[..., None] * d).sum(2)        # [H, W, 2]
                ys, xs = jnp.mgrid[0:H, 0:W]
                sx = (xs + 0.5) / W + off[..., 0]
                sy = (ys + 0.5) / H + off[..., 1]
                fx = jnp.clip(sx * W - 0.5, 0.0, W - 1.001)
                fy = jnp.clip(sy * H - 0.5, 0.0, H - 1.001)
                x0, y0 = jnp.floor(fx).astype(jnp.int32), \
                    jnp.floor(fy).astype(jnp.int32)
                wx, wy = fx - x0, fy - y0
                p = portrait
                out = (p[y0, x0] * ((1 - wx) * (1 - wy))[..., None]
                       + p[y0, x0 + 1] * (wx * (1 - wy))[..., None]
                       + p[y0 + 1, x0] * ((1 - wx) * wy)[..., None]
                       + p[y0 + 1, x0 + 1] * (wx * wy)[..., None])
                return out

            return jax.vmap(one)(full)                    # [T, H, W, 3]

        return render

    def render(self, portrait: np.ndarray, landmarks) -> np.ndarray:
        """portrait [H, W, 3] float (0-1) or uint8; landmarks [T, 68, 2] in
        unit coords → uint8 frames [T, H, W, 3]."""
        p = np.asarray(portrait, np.float32)
        if p.max() > 1.5:
            p = p / 255.0
        frames = self._render_fn(jnp.asarray(p), jnp.asarray(landmarks))
        return np.asarray(jnp.clip(frames, 0, 1) * 255).astype(np.uint8)


def default_portrait(height: int = 256, width: int = 256) -> np.ndarray:
    """Procedural cartoon portrait aligned with the landmark template (used
    when no reference photo is supplied)."""
    tpl = template_landmarks()
    ys, xs = np.mgrid[0:height, 0:width]
    x = (xs + 0.5) / width
    y = (ys + 0.5) / height
    img = np.ones((height, width, 3)) * np.array([0.16, 0.22, 0.30])
    # face oval
    face = (((x - 0.5) / 0.34) ** 2 + ((y - 0.50) / 0.42) ** 2) <= 1.0
    img[face] = [0.91, 0.76, 0.65]

    def disc(cx, cy, r, color, aspect=1.0):
        m = (((x - cx) / r) ** 2 + ((y - cy) / (r * aspect)) ** 2) <= 1.0
        img[m] = color

    for c in (tpl[36:42].mean(0), tpl[42:48].mean(0)):      # eyes
        disc(c[0], c[1], 0.055, [1.0, 1.0, 1.0], 0.55)
        disc(c[0], c[1], 0.022, [0.15, 0.25, 0.45], 1.0)
    for c in (tpl[17:22], tpl[22:27]):                       # brows
        b = c.mean(0)
        m = (np.abs(y - b[1]) < 0.012) & (np.abs(x - b[0]) < 0.07)
        img[m] = [0.25, 0.17, 0.12]
    disc(0.5, 0.54, 0.022, [0.80, 0.60, 0.50], 1.4)          # nose tip
    disc(0.5, 0.70, 0.085, [0.75, 0.35, 0.33], 0.5)          # lips
    disc(0.5, 0.70, 0.048, [0.45, 0.15, 0.15], 0.4)          # mouth
    return img.astype(np.float32)
