"""Per-op attribution of the SphereNet torsion quad fold at box scale.

Round-5 VERDICT item 3: spherenet runs at 0.03 of the bandwidth roof at
the 30k box (10.4 s/step) and the quad fold (the reference's quadratic
torsion candidate expansion, spherenet_layer.py:535-561) is the suspect.
This times the fold's stages standalone over the REAL quad schedule
(fetched-loop protocol per CLAUDE.md), then A/B's the restructured fold
(per-triplet operand hoisting + wide packed gather + pseudo-angle keys).

All index arrays ride as jit ARGUMENTS (trace-time constants of this
size are poison — CLAUDE.md).

Usage: python scripts/profile_spherenet.py [n_nodes] [quad_chunk]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from profile_tfn import timed
from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.graph import GraphLoader
from geometric_message_passing_tpu.models.spherenet import spherenet_geometry
from geometric_message_passing_tpu.ops.norms import safe_arctan2, safe_norm


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 1_048_576
    graphs = ds.create_molecular_boxes(num=1, n_nodes=n, cutoff=3.0,
                                       avg_degree=14.0, n_species=8, seed=0)
    batch = next(iter(GraphLoader(graphs, batch_size=1, with_triplets=True,
                                  with_quads=True)))
    tri = batch.triplets
    Q = int(tri.q_trip.shape[0])
    T = int(tri.idx_i.shape[0])
    print(f"N={batch.atoms.shape[0]} E={batch.senders.shape[0]} "
          f"T={T} Q={Q} chunk={chunk}", flush=True)

    pos = batch.pos
    num_t = T
    C = min(chunk, Q)
    n_chunks = -(-Q // C)
    pad = n_chunks * C - Q

    def pad_np(v, fill):
        v = np.asarray(v)
        if pad:
            tail = np.full((pad,) + v.shape[1:], fill, v.dtype)
            v = np.concatenate([v, tail], axis=0)
        return jnp.asarray(v.reshape(n_chunks, C))

    XS = (pad_np(tri.q_trip, 0), pad_np(tri.q_kn, 0),
          pad_np(tri.q_mask, False))
    TRI = (jnp.asarray(tri.idx_i), jnp.asarray(tri.idx_j),
           jnp.asarray(tri.idx_k))

    def chunked(fold_one, ops):
        """fold_one(carry_args, q, kn, qmask) -> [T]; min-combined chunks."""

        def run(p, tri_idx, xs):
            carry = fold_one.prepare(p, tri_idx)

            def body(acc, z):
                return jnp.minimum(acc, fold_one(carry, tri_idx, *z)), ()

            acc0 = jnp.full((num_t,), jnp.inf, jnp.float32)
            out, _ = jax.lax.scan(jax.checkpoint(body), acc0, xs)
            return ops(out)

        return run

    # ---- stage bodies ------------------------------------------------

    class GathersOnly:
        @staticmethod
        def prepare(p, tri_idx):
            return p

        def __call__(self, p, tri_idx, q, kn, qmask):
            idx_i, idx_j, idx_k = tri_idx
            s = p[idx_j[q]] + p[idx_k[q]] + p[idx_i[q]] + p[kn]
            return jax.ops.segment_min(
                jnp.where(qmask, jnp.sum(s, -1), jnp.inf), q,
                num_segments=num_t)

    class GeomNoTrig:
        @staticmethod
        def prepare(p, tri_idx):
            return p

        def __call__(self, p, tri_idx, q, kn, qmask):
            a_t, b_t, _ = _geom(p, tri_idx, q, kn)
            v = a_t + b_t
            return jax.ops.segment_min(jnp.where(qmask, v, jnp.inf), q,
                                       num_segments=num_t)

    class FullFold:
        @staticmethod
        def prepare(p, tri_idx):
            return p

        def __call__(self, p, tri_idx, q, kn, qmask):
            idx_k = tri_idx[2]
            a_t, b_t, _ = _geom(p, tri_idx, q, kn)
            torsion1 = safe_arctan2(b_t, a_t)
            torsion1 = jnp.where(torsion1 <= 0, torsion1 + 2 * math.pi,
                                 torsion1)
            degen = kn == idx_k[q]
            torsion1 = jnp.where(degen, 2 * math.pi, torsion1)
            torsion1 = jnp.where(qmask, torsion1, jnp.inf)
            return jax.ops.segment_min(torsion1, q, num_segments=num_t)

    def _geom(p, tri_idx, q, kn):
        idx_i, idx_j, idx_k = tri_idx
        pos_j = p[idx_j[q]]
        pos_j0 = p[idx_k[q]] - pos_j
        pos_ji_q = p[idx_i[q]] - pos_j
        pos_jk_q = p[kn] - pos_j
        dist_ji = safe_norm(pos_ji_q, axis=-1)
        plane1 = jnp.cross(pos_ji_q, pos_j0)
        plane2 = jnp.cross(pos_ji_q, pos_jk_q)
        a_t = jnp.sum(plane1 * plane2, axis=-1)
        b_t = jnp.sum(jnp.cross(plane1, plane2) * pos_ji_q,
                      axis=-1) / jnp.maximum(dist_ji, 1e-9)
        return a_t, b_t, dist_ji

    # ---- restructured fold: hoist per-triplet operands, one WIDE gather
    # (the DimeNet narrow-row cliff: rows under 64 f32 take a ~3x slower
    # gather path), pseudo-angle min keys (no per-quad arctan2).

    def packed_tables(p, tri_idx, width=64):
        idx_i, idx_j, idx_k = tri_idx
        pos_ji_t = p[idx_i] - p[idx_j]
        pos_j0_t = p[idx_k] - p[idx_j]
        plane1_t = jnp.cross(pos_ji_t, pos_j0_t)
        inv_dji = 1.0 / jnp.maximum(safe_norm(pos_ji_t, axis=-1), 1e-9)
        tbl = jnp.concatenate(
            [p[idx_j], pos_ji_t, plane1_t, inv_dji[:, None],
             idx_k[:, None].astype(jnp.float32)], axis=-1)     # [T, 11]
        return jnp.pad(tbl, ((0, 0), (0, width - tbl.shape[-1])))

    def _key_fold(row, pos_kn, kn, qmask, q):
        pos_j = row[:, 0:3]
        pos_ji_q = row[:, 3:6]
        plane1 = row[:, 6:9]
        inv_dji = row[:, 9]
        idx_k_q = row[:, 10]
        pos_jk_q = pos_kn - pos_j
        plane2 = jnp.cross(pos_ji_q, pos_jk_q)
        a_t = jnp.sum(plane1 * plane2, axis=-1)
        b_t = jnp.sum(jnp.cross(plane1, plane2) * pos_ji_q,
                      axis=-1) * inv_dji
        denom = jnp.maximum(jnp.abs(a_t) + jnp.abs(b_t), 1e-30)
        f = jnp.abs(b_t) / denom
        key = jnp.where(a_t >= 0, jnp.where(b_t >= 0, f, 4.0 - f),
                        jnp.where(b_t >= 0, 2.0 - f, 2.0 + f))
        key = jnp.where(key == 0.0, 4.0, key)          # theta=0 -> 2pi
        degen = kn == idx_k_q.astype(jnp.int32)
        key = jnp.where(degen, 4.0, key)
        key = jnp.where(qmask, key, jnp.inf)
        return jax.ops.segment_min(key, q, num_segments=num_t)

    class WideKey:
        @staticmethod
        def prepare(p, tri_idx):
            return p, packed_tables(p, tri_idx)

        def __call__(self, carry, tri_idx, q, kn, qmask):
            p, tbl = carry
            return _key_fold(tbl[q], p[kn], kn, qmask, q)

    class WideKeyPos64:
        @staticmethod
        def prepare(p, tri_idx):
            return jnp.pad(p, ((0, 0), (0, 61))), packed_tables(p, tri_idx)

        def __call__(self, carry, tri_idx, q, kn, qmask):
            p64, tbl = carry
            return _key_fold(tbl[q], p64[kn][:, :3], kn, qmask, q)

    def key_to_torsion(key):
        kq = jnp.clip(jnp.floor(key), 0, 3)
        fr = key - kq
        a_hat = jnp.select([kq == 0, kq == 1, kq == 2],
                           [1 - fr, -fr, -(1 - fr)], fr)
        b_hat = jnp.select([kq == 0, kq == 1, kq == 2],
                           [fr, 1 - fr, -fr], -(1 - fr))
        th = safe_arctan2(b_hat, a_hat)
        th = jnp.where(th <= 0, th + 2 * math.pi, th)
        th = jnp.where(key >= 4.0, 2 * math.pi, th)
        return jnp.where(jnp.isfinite(key), th, 0)

    finish_raw = lambda raw: jnp.where(jnp.isfinite(raw), raw, 0)

    timed("gathers only", chunked(GathersOnly(), finish_raw), pos, TRI, XS)
    timed("geom (no trig)", chunked(GeomNoTrig(), finish_raw), pos, TRI, XS)
    timed("full fold (current)", chunked(FullFold(), finish_raw),
          pos, TRI, XS)
    timed("wide+key fold (new)", chunked(WideKey(), key_to_torsion),
          pos, TRI, XS)
    timed("wide+key+pos64 fold", chunked(WideKeyPos64(), key_to_torsion),
          pos, TRI, XS)

    # correctness vs the model's own geometry path
    ref = np.asarray(jax.jit(
        lambda b: spherenet_geometry(b, quad_chunk=chunk)[2])(batch))
    new = np.asarray(jax.jit(chunked(WideKey(), key_to_torsion))(
        pos, TRI, XS))
    err = np.abs(ref - new).max()
    print(f"max |torsion diff| vs current path: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
