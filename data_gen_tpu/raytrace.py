"""Batched ray-mesh intersection on the accelerator.

TPU-first replacement for the reference's CPU Embree path
(data_gen/dtu_mvs/surf_from_mvs.py:66 uses
trimesh.ray.ray_pyembree.RayMeshIntersector): a dense Moller-Trumbore
test over (ray chunk) x (triangle chunk) tiles, reduced with a running
nearest-hit min -- embarrassingly parallel work that maps straight onto
the VPU instead of a serial BVH walk.
"""

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-9


def _moller_trumbore(rayo, rayd, v0, e1, e2):
    """First-hit t for each ray against each triangle.

    Args:
      rayo, rayd: (R, 3).
      v0: (T, 3) triangle base vertices; e1/e2: (T, 3) edge vectors.

    Returns:
      t: (R, T), +inf where no hit.
    """
    pvec = jnp.cross(rayd[:, None, :], e2[None, :, :])  # (R,T,3)
    det = jnp.einsum('tc,rtc->rt', e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > EPS, 1.0 / det, 0.0)
    tvec = rayo[:, None, :] - v0[None, :, :]  # (R,T,3)
    u = jnp.einsum('rtc,rtc->rt', tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])  # (R,T,3)
    v = jnp.einsum('rc,rtc->rt', rayd, qvec) * inv_det
    t = jnp.einsum('tc,rtc->rt', e2, qvec) * inv_det
    hit = (jnp.abs(det) > EPS) & (u >= 0) & (v >= 0) & (u + v <= 1) \
        & (t > EPS)
    return jnp.where(hit, t, jnp.inf)


def _first_hit_chunk(rayo, rayd, tris, tri_chunk):
    """(R,3),(R,3),(Tpad,3,3) -> (t_min (R,), tri_idx (R,)) scanning
    triangle chunks."""
    n_tris = tris.shape[0]
    n_tc = n_tris // tri_chunk
    tris_c = tris.reshape(n_tc, tri_chunk, 3, 3)
    base = jnp.arange(n_tc) * tri_chunk

    def body(carry, inp):
        t_min, idx_min = carry
        tri_blk, blk_base = inp
        v0 = tri_blk[:, 0]
        e1 = tri_blk[:, 1] - v0
        e2 = tri_blk[:, 2] - v0
        t = _moller_trumbore(rayo, rayd, v0, e1, e2)  # (R, tc)
        t_blk = jnp.min(t, axis=1)
        i_blk = jnp.argmin(t, axis=1) + blk_base
        better = t_blk < t_min
        return (jnp.where(better, t_blk, t_min),
                jnp.where(better, i_blk, idx_min)), None

    init = (jnp.full(rayo.shape[0], jnp.inf),
            jnp.full(rayo.shape[0], -1, jnp.int32))
    (t_min, idx_min), _ = jax.lax.scan(body, init, (tris_c, base))
    return t_min, idx_min


def intersect(rayo, rayd, vertices, faces, ray_chunk=4096,
              tri_chunk=8192, any_hit_only=False):
    """First-hit intersection of N rays against a triangle mesh.

    Args:
      rayo, rayd: (N, 3) float arrays (directions need not be unit).
      vertices: (V, 3); faces: (F, 3) int.
      any_hit_only: semantic hint only -- occlusion queries get the same
        nearest-hit scan (cheap enough on the accelerator).

    Returns:
      hit: (N,) bool; t: (N,) float (inf when no hit); tri_idx: (N,) int.
    """
    rayo = jnp.asarray(rayo, jnp.float32)
    rayd = jnp.asarray(rayd, jnp.float32)
    tris = jnp.asarray(
        np.asarray(vertices, np.float32)[np.asarray(faces, np.int64)])
    # Pad triangles to the chunk size with degenerate (never-hit) tris
    n_tris = tris.shape[0]
    tri_chunk = min(tri_chunk, max(256, n_tris))
    pad_t = (-n_tris) % tri_chunk
    if pad_t:
        tris = jnp.concatenate(
            [tris, jnp.zeros((pad_t, 3, 3), jnp.float32)], axis=0)

    n = rayo.shape[0]
    ray_chunk = min(ray_chunk, max(64, n))
    pad_r = (-n) % ray_chunk
    if pad_r:
        rayo = jnp.concatenate([rayo, rayo[-1:].repeat(pad_r, 0)], axis=0)
        rayd = jnp.concatenate([rayd, rayd[-1:].repeat(pad_r, 0)], axis=0)
    n_rc = rayo.shape[0] // ray_chunk

    fn = jax.jit(lambda o, d: _first_hit_chunk(o, d, tris, tri_chunk))
    t_out = np.empty(rayo.shape[0], np.float32)
    i_out = np.empty(rayo.shape[0], np.int32)
    for c in range(n_rc):
        sl = slice(c * ray_chunk, (c + 1) * ray_chunk)
        t_c, i_c = fn(rayo[sl], rayd[sl])
        t_out[sl] = np.asarray(t_c)
        i_out[sl] = np.asarray(i_c)
    t_out, i_out = t_out[:n], i_out[:n]
    hit = np.isfinite(t_out)
    return hit, t_out, i_out


def face_normals(vertices, faces):
    """(F, 3) unit normals with right-hand winding."""
    v = np.asarray(vertices, np.float64)[np.asarray(faces, np.int64)]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    return (n / np.maximum(norm, 1e-12)).astype(np.float32)
