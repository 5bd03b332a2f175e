"""SphereNet (Liu et al., spherical message passing with torsion) — TPU-native
redesign of /root/reference/models/spherenet.py:10-110 and the layer stack of
/root/reference/models/layers/spherenet_layer.py.

The data-dependent torsion pipeline (quadratic quad expansion + scatter-min
folding, spherenet_layer.py:535-559) becomes: host-precomputed static quad
indices (triplets.py) + in-graph dihedral computation + masked segment-min.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops.dimenet_basis import AngleEmb, DistEmb, TorsionEmb
from ..ops.scatter import segment_min, segment_sum, segment_sum_into
from .dimenet import (ResidualLayer, glorot_orthogonal, swish,
                      torch_linear_bias_init, torch_linear_kernel_init)
from .pooling import POOL
from ..ops.norms import safe_arctan2, safe_norm


class SphereNetInit(nn.Module):
    """init_e (spherenet_layer.py:69-101): edge features from endpoint
    embeddings + rbf."""

    num_radial: int
    hidden: int
    use_node_features: bool = True

    @nn.compact
    def __call__(self, atoms, rbf, receivers, senders):
        if self.use_node_features:
            x = nn.Embed(
                95, self.hidden,
                embedding_init=nn.initializers.uniform(scale=2 * math.sqrt(3)),
                name="emb",
            )(atoms) - math.sqrt(3)
        else:
            ne = self.param("node_embedding", nn.initializers.normal(1.0),
                            (self.hidden,))
            x = jnp.broadcast_to(ne, (atoms.shape[0], self.hidden))
        # lin_rbf_0 / lin stay on torch.nn.Linear defaults in the reference
        # (init.reset_parameters calls their own reset, spherenet_layer.py:84-88)
        rbf0 = swish(nn.Dense(
            self.hidden, kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(self.num_radial),
            name="lin_rbf_0")(rbf))
        e1 = swish(
            nn.Dense(self.hidden, kernel_init=torch_linear_kernel_init,
                     bias_init=torch_linear_bias_init(3 * self.hidden),
                     name="lin")(
                jnp.concatenate([x[receivers], x[senders], rbf0], axis=-1)
            )
        )
        e2 = nn.Dense(self.hidden, use_bias=False,
                      kernel_init=glorot_orthogonal(), name="lin_rbf_1")(rbf) * e1
        return e1, e2


class SphereNetUpdateE(nn.Module):
    """update_e (spherenet_layer.py:104-192): the triplet/torsion core.

    ``triplet_chunk`` (round 4, box scale): the [T, ns*nr] sbf and
    [T, ns^2*nr] tbf expansions plus the gathered [T, int_emb] products are
    the per-triplet giants (tbf alone ~6 GB at a 30k-node box); chunked
    mode takes a ``basis_ctx`` (rbf_sph [E, ns*nr], angle [T], torsion [T])
    instead of materialized sbf/tbf and evaluates basis + projections +
    gather-multiply + masked segment-sum per block inside an nn.scan with
    a rematerialized body.  All Dense layers carry fixed names, so both
    modes build identical parameter trees; elementwise over T -> exact."""

    hidden: int
    int_emb_size: int
    basis_emb_size_dist: int
    basis_emb_size_angle: int
    basis_emb_size_torsion: int
    num_spherical: int
    num_radial: int
    num_before_skip: int
    num_after_skip: int
    triplet_chunk: Optional[int] = None

    def _triplet_pass(self, x_kj, sbf, t, idx_kj, idx_ji, t_mask, num_edges,
                      basis_ctx=None):
        go = glorot_orthogonal

        def proj_sbf(mdl, sb):
            sb = nn.Dense(mdl.basis_emb_size_angle, use_bias=False,
                          kernel_init=go(), name="lin_sbf1")(sb)
            return nn.Dense(mdl.int_emb_size, use_bias=False,
                            kernel_init=go(), name="lin_sbf2")(sb)

        def proj_t(mdl, tb):
            tb = nn.Dense(mdl.basis_emb_size_torsion, use_bias=False,
                          kernel_init=go(), name="lin_t1")(tb)
            return nn.Dense(mdl.int_emb_size, use_bias=False,
                            kernel_init=go(), name="lin_t2")(tb)

        def bases_of(ctx, kj, ang, tor):
            from ..ops.dimenet_basis import angle_cbf, torsion_cbf

            ns = ctx["ns"]
            rs = ctx["rbf_sph"][kj]                       # [c, ns*nr]
            cbf = angle_cbf(ang, ns)                      # [c, ns]
            sb = (rs.reshape(rs.shape[0], ns, -1) * cbf[:, :, None]
                  ).reshape(rs.shape[0], -1)
            tcb = torsion_cbf(ang, tor, ns)               # [c, ns*ns]
            tb = (rs.reshape(rs.shape[0], 1, ns, -1)
                  * tcb.reshape(tcb.shape[0], ns, ns, 1)
                  ).reshape(rs.shape[0], -1)
            return sb, tb

        T = idx_kj.shape[0]
        C = self.triplet_chunk
        if C is None or T <= C:
            if sbf is None:
                sbf, t = bases_of(basis_ctx, idx_kj, basis_ctx["angle"],
                                  basis_ctx["torsion"])
            y = x_kj[idx_kj] * proj_sbf(self, sbf)
            y = y * proj_t(self, t)
            return segment_sum(y, idx_ji, num_edges, mask=t_mask)
        n_chunks = -(-T // C)
        pad = n_chunks * C - T

        def pad_to(v, fill):
            if not pad:
                return v
            tail = jnp.full((pad,) + v.shape[1:], fill, v.dtype)
            return jnp.concatenate([v, tail], axis=0)

        def chunked(v, fill=0):
            return pad_to(v, fill).reshape((n_chunks, C) + v.shape[1:])

        in_chunk_basis = sbf is None
        xs = [chunked(idx_kj), chunked(idx_ji), chunked(t_mask, False)]
        if in_chunk_basis:
            xs += [chunked(basis_ctx["angle"]), chunked(basis_ctx["torsion"])]
        else:
            xs += [chunked(sbf), chunked(t)]

        def body(mdl, acc, z):
            if in_chunk_basis:
                kj, ji, m, ang, tor = z
                sb, tb = bases_of(basis_ctx, kj, ang, tor)
            else:
                kj, ji, m, sb, tb = z
            y = x_kj[kj] * proj_sbf(mdl, sb)
            y = y * proj_t(mdl, tb)
            return segment_sum_into(acc, y, ji, mask=m), ()

        body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False})
        acc0 = jnp.zeros((num_edges, self.int_emb_size), x_kj.dtype)
        acc, _ = scan(self, acc0, tuple(xs))
        return acc

    @nn.compact
    def __call__(self, e, emb, idx_kj, idx_ji, t_mask, basis_ctx=None):
        go = glorot_orthogonal
        rbf0, sbf, t = emb
        x1, _ = e
        num_edges = x1.shape[0]

        x_ji = swish(nn.Dense(self.hidden, kernel_init=go(), name="lin_ji")(x1))
        x_kj = swish(nn.Dense(self.hidden, kernel_init=go(), name="lin_kj")(x1))

        rbf = nn.Dense(self.basis_emb_size_dist, use_bias=False,
                       kernel_init=go(), name="lin_rbf1")(rbf0)
        rbf = nn.Dense(self.hidden, use_bias=False, kernel_init=go(),
                       name="lin_rbf2")(rbf)
        x_kj = x_kj * rbf
        x_kj = swish(nn.Dense(self.int_emb_size, use_bias=False,
                              kernel_init=go(), name="lin_down")(x_kj))

        x_kj = self._triplet_pass(x_kj, sbf, t, idx_kj, idx_ji, t_mask,
                                  num_edges, basis_ctx=basis_ctx)
        x_kj = swish(nn.Dense(self.hidden, use_bias=False, kernel_init=go(),
                              name="lin_up")(x_kj))

        e1 = x_ji + x_kj
        for k in range(self.num_before_skip):
            e1 = ResidualLayer(self.hidden, name=f"res_before_{k}")(e1)
        e1 = swish(nn.Dense(self.hidden, kernel_init=go(), name="lin")(e1)) + x1
        for k in range(self.num_after_skip):
            e1 = ResidualLayer(self.hidden, name=f"res_after_{k}")(e1)
        e2 = nn.Dense(self.hidden, use_bias=False, kernel_init=go(),
                      name="lin_rbf")(rbf0) * e1
        return e1, e2


class SphereNetUpdateU(nn.Module):
    """update_u (spherenet_layer.py:229-235): graph-level accumulator
    u += scatter(v, batch). Constructed but disabled in the reference forward
    (spherenet.py:100-107); exposed here via use_virtual_node."""

    @nn.compact
    def __call__(self, u, v, batch):
        from ..ops.scatter import segment_sum

        return u + segment_sum(v, batch.graph_id, batch.num_graphs,
                               mask=batch.node_mask)


class SphereNetUpdateV(nn.Module):
    """update_v (spherenet_layer.py:195-226): scatter edges to nodes + MLP."""

    hidden: int
    out_emb_channels: int
    out_dim: int
    num_output_layers: int
    output_init: str = "GlorotOrthogonal"

    @nn.compact
    def __call__(self, e, receivers, num_nodes, edge_mask):
        _, e2 = e
        v = segment_sum(e2, receivers, num_nodes, mask=edge_mask)
        # lin_up's bias is never reset in the reference (update_v.reset_parameters
        # touches only the weight, spherenet_layer.py:210-211) -> torch default
        v = nn.Dense(self.out_emb_channels, kernel_init=glorot_orthogonal(),
                     bias_init=torch_linear_bias_init(self.hidden),
                     name="lin_up")(v)
        for k in range(self.num_output_layers):
            v = swish(nn.Dense(self.out_emb_channels,
                               kernel_init=glorot_orthogonal(),
                               name=f"lin_{k}")(v))
        init = (nn.initializers.zeros if self.output_init == "zeros"
                else glorot_orthogonal())
        return nn.Dense(self.out_dim, use_bias=False, kernel_init=init,
                        name="lin")(v)


def spherenet_geometry(batch: GraphBatch, quad_chunk=None,
                       torsion_fold: str = "widekey"):
    """dist / angle / torsion from positions (xyz_to_dat numerics,
    spherenet_layer.py:496-561) over precomputed static indices.

    ``quad_chunk`` (round 4, box scale): the torsion candidate set is
    QUADRATIC in neighborhood size (Q ~ avg_degree * T quads — the hardest
    static-shape case in the reference, spherenet_layer.py:535-546); its
    [Q, 3] plane/cross intermediates are GBs at >=10k-node boxes.  Chunked
    mode runs the per-quad dihedral + masked segment-min per block inside a
    rematerialized lax.scan, combining blocks with jnp.minimum (min is
    associative -> identical result).

    ``torsion_fold`` (round 5, VERDICT item 3 — scripts/profile_spherenet.py):
      * 'widekey' (default): per-op profiling showed the fold is GATHER-
        bound, not trig-bound — five width-3 gathers per quad fall off the
        TPU's narrow-row cliff (rows under 64 f32 take a ~3x slower path,
        same cliff root-caused for DimeNet this round).  This mode hoists
        all per-triplet operands (pos_j, pos_ji, plane1, 1/|ji|, idx_k)
        into ONE 64-wide packed table gathered once per quad, and replaces
        the per-quad arctan2 with a piecewise-linear pseudo-angle key
        (monotone with the (0, 2pi] torsion); the exact angle is recovered
        per TRIPLET after the segment-min.  Measured @10k box: 2418 ->
        1116 ms for the fold (2.17x); max |torsion diff| 4.8e-7.
      * 'atan2': the round-4 direct evaluation (bitwise reproduction of
        earlier published runs — see MIGRATION.md)."""
    import jax

    tri = batch.triplets
    pos = batch.pos
    j, i = batch.senders, batch.receivers
    dist = safe_norm(pos[i] - pos[j], axis=-1)

    # angle at j between (i-j) and (k-j), range (0, pi)
    pos_ji = pos[tri.idx_i] - pos[tri.idx_j]
    pos_jk = pos[tri.idx_k] - pos[tri.idx_j]
    a = jnp.sum(pos_ji * pos_jk, axis=-1)
    b = safe_norm(jnp.cross(pos_ji, pos_jk), axis=-1)
    angle = safe_arctan2(b, a)

    # torsion: dihedral between plane(ji, jk_t) and plane(ji, jk_n),
    # folded to (0, 2pi], min over candidates k_n per triplet.
    num_t = tri.idx_i.shape[0]

    def quad_torsion(q, kn, qmask):
        """Raw per-triplet segment-min over one block of quad candidates
        (+inf where empty; the empty->0 fold happens once at the end)."""
        pos_j = pos[tri.idx_j[q]]
        pos_j0 = pos[tri.idx_k[q]] - pos_j
        pos_ji_q = pos[tri.idx_i[q]] - pos_j
        pos_jk_q = pos[kn] - pos_j
        dist_ji = safe_norm(pos_ji_q, axis=-1)
        plane1 = jnp.cross(pos_ji_q, pos_j0)
        plane2 = jnp.cross(pos_ji_q, pos_jk_q)
        a_t = jnp.sum(plane1 * plane2, axis=-1)
        b_t = jnp.sum(
            jnp.cross(plane1, plane2) * pos_ji_q, axis=-1
        ) / jnp.maximum(dist_ji, 1e-9)
        torsion1 = safe_arctan2(b_t, a_t)
        torsion1 = jnp.where(torsion1 <= 0, torsion1 + 2 * math.pi, torsion1)
        # The k_n == k candidate is exactly coplanar (torsion 2*pi); XLA's
        # FMA reassociation leaves b_t = +/-1e-9 which the 0/2pi fold
        # amplifies to O(2pi) noise — pin it to the exact value.
        degen = kn == tri.idx_k[q]
        torsion1 = jnp.where(degen, 2 * math.pi, torsion1)
        pos_inf = jnp.asarray(jnp.inf, torsion1.dtype)
        torsion1 = jnp.where(qmask, torsion1, pos_inf)
        return jax.ops.segment_min(torsion1, q, num_segments=num_t)

    if torsion_fold == "widekey":
        # per-triplet operand table, padded to the 64-f32 fast-gather row
        plane1_t = jnp.cross(pos_ji, pos_jk)
        inv_dji = 1.0 / jnp.maximum(safe_norm(pos_ji, axis=-1), 1e-9)
        tbl = jnp.concatenate(
            [pos[tri.idx_j], pos_ji, plane1_t, inv_dji[:, None],
             tri.idx_k[:, None].astype(jnp.float32)], axis=-1)  # [T, 11]
        tbl = jnp.pad(tbl, ((0, 0), (0, 64 - tbl.shape[-1])))

        def quad_body(q, kn, qmask):
            row = tbl[q]
            pos_j = row[:, 0:3]
            pos_ji_q = row[:, 3:6]
            plane1 = row[:, 6:9]
            pos_jk_q = pos[kn] - pos_j
            plane2 = jnp.cross(pos_ji_q, pos_jk_q)
            a_t = jnp.sum(plane1 * plane2, axis=-1)
            b_t = jnp.sum(jnp.cross(plane1, plane2) * pos_ji_q,
                          axis=-1) * row[:, 9]
            denom = jnp.maximum(jnp.abs(a_t) + jnp.abs(b_t), 1e-30)
            f = jnp.abs(b_t) / denom
            key = jnp.where(a_t >= 0, jnp.where(b_t >= 0, f, 4.0 - f),
                            jnp.where(b_t >= 0, 2.0 - f, 2.0 + f))
            key = jnp.where(key == 0.0, 4.0, key)       # theta=0 -> 2pi
            degen = kn == row[:, 10].astype(jnp.int32)
            key = jnp.where(degen, 4.0, key)
            key = jnp.where(qmask, key, jnp.inf)
            return jax.ops.segment_min(key, q, num_segments=num_t)

        def finish(key):
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

    else:
        assert torsion_fold == "atan2", torsion_fold
        quad_body = quad_torsion
        finish = lambda raw: jnp.where(jnp.isfinite(raw), raw, 0)

    Q = tri.q_trip.shape[0]
    C = quad_chunk
    if C is None or Q <= C:
        raw = quad_body(tri.q_trip, tri.q_kn, tri.q_mask)
    else:
        n_chunks = -(-Q // C)
        pad = n_chunks * C - Q

        def pad_to(v, fill):
            if not pad:
                return v
            tail = jnp.full((pad,) + v.shape[1:], fill, v.dtype)
            return jnp.concatenate([v, tail], axis=0)

        xs = (
            pad_to(tri.q_trip, 0).reshape(n_chunks, C),
            pad_to(tri.q_kn, 0).reshape(n_chunks, C),
            pad_to(tri.q_mask, False).reshape(n_chunks, C),
        )

        @jax.checkpoint
        def body(acc, z):
            return jnp.minimum(acc, quad_body(*z)), ()

        acc0 = jnp.full((num_t,), jnp.inf, dist.dtype)
        raw, _ = jax.lax.scan(body, acc0, xs)
    torsion = finish(raw)
    return dist, angle, torsion


class SphereNetModel(nn.Module):
    """Constructor surface mirrors spherenet.py:14-35 (same defaults)."""

    cutoff: float = 10.0
    num_layers: int = 4
    hidden_channels: int = 128
    in_dim: int = 1
    out_dim: int = 1
    int_emb_size: int = 64
    basis_emb_size_dist: int = 8
    basis_emb_size_angle: int = 8
    basis_emb_size_torsion: int = 8
    out_emb_channels: int = 128
    num_spherical: int = 7
    num_radial: int = 6
    envelope_exponent: int = 5
    num_before_skip: int = 1
    num_after_skip: int = 2
    num_output_layers: int = 2
    output_init: str = "GlorotOrthogonal"
    use_node_features: bool = True
    pool: str = "sum"
    # box-scale memory strategies (round 4): triplet-block size for
    # update_e (basis evaluated in-chunk) and quad-block size for the
    # torsion candidate fold — see SphereNetUpdateE / spherenet_geometry.
    triplet_chunk: Optional[int] = None
    quad_chunk: Optional[int] = None
    # round 5: 'widekey' (gather-cliff-aware packed fold, 2.17x, default)
    # or 'atan2' (round-4 direct evaluation) — see spherenet_geometry.
    torsion_fold: str = "widekey"

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        assert batch.triplets is not None and batch.triplets.q_trip is not None, (
            "SphereNet needs triplet+quad indices (with_quads=True)"
        )
        tri = batch.triplets
        dist, angle, torsion = spherenet_geometry(
            batch, quad_chunk=self.quad_chunk,
            torsion_fold=self.torsion_fold)

        rbf = DistEmb(self.num_radial, self.cutoff, self.envelope_exponent,
                      zero_outside=False, name="dist_emb")(dist)
        basis_ctx = None
        if self.triplet_chunk is not None:
            from ..ops.dimenet_basis import sph_bessel_rbf

            sbf = tbf = None
            basis_ctx = {
                "rbf_sph": sph_bessel_rbf(dist, self.num_spherical,
                                          self.num_radial, self.cutoff),
                "angle": angle, "torsion": torsion,
                "ns": self.num_spherical,
            }
        else:
            sbf = AngleEmb(self.num_spherical, self.num_radial, self.cutoff,
                           name="angle_emb")(dist, angle, tri.idx_kj)
            tbf = TorsionEmb(self.num_spherical, self.num_radial, self.cutoff,
                             name="torsion_emb")(dist, angle, torsion,
                                                 tri.idx_kj)
        emb = (rbf, sbf, tbf)

        e = SphereNetInit(
            self.num_radial, self.hidden_channels, self.use_node_features,
            name="init_e",
        )(batch.atoms, rbf, batch.receivers, batch.senders)
        v = SphereNetUpdateV(
            self.hidden_channels, self.out_emb_channels, self.out_dim,
            self.num_output_layers, self.output_init, name="init_v",
        )(e, batch.receivers, batch.num_nodes, batch.edge_mask)

        for blk in range(self.num_layers):
            e = SphereNetUpdateE(
                self.hidden_channels, self.int_emb_size,
                self.basis_emb_size_dist, self.basis_emb_size_angle,
                self.basis_emb_size_torsion, self.num_spherical,
                self.num_radial, self.num_before_skip, self.num_after_skip,
                triplet_chunk=self.triplet_chunk,
                name=f"update_e_{blk}",
            )(e, emb, tri.idx_kj, tri.idx_ji, tri.t_mask,
              basis_ctx=basis_ctx)
            # NOTE: v is REPLACED each layer (spherenet.py:105), unlike
            # DimeNet's accumulated P
            v = SphereNetUpdateV(
                self.hidden_channels, self.out_emb_channels, self.out_dim,
                self.num_output_layers, self.output_init,
                name=f"update_v_{blk}",
            )(e, batch.receivers, batch.num_nodes, batch.edge_mask)

        return POOL[self.pool](v, batch)
