"""SphereNet (Liu et al., spherical message passing with torsion) — TPU-native
redesign of /root/reference/models/spherenet.py:10-110 and the layer stack of
/root/reference/models/layers/spherenet_layer.py.

The data-dependent torsion pipeline (quadratic quad expansion + scatter-min
folding, spherenet_layer.py:535-559) becomes: host-precomputed static quad
indices (triplets.py) + in-graph dihedral computation + masked segment-min.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops.dimenet_basis import AngleEmb, DistEmb, TorsionEmb
from ..ops.scatter import segment_min, segment_sum
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
    """update_e (spherenet_layer.py:104-192): the triplet/torsion core."""

    hidden: int
    int_emb_size: int
    basis_emb_size_dist: int
    basis_emb_size_angle: int
    basis_emb_size_torsion: int
    num_spherical: int
    num_radial: int
    num_before_skip: int
    num_after_skip: int

    @nn.compact
    def __call__(self, e, emb, idx_kj, idx_ji, t_mask):
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

        sbf_p = nn.Dense(self.basis_emb_size_angle, use_bias=False,
                         kernel_init=go(), name="lin_sbf1")(sbf)
        sbf_p = nn.Dense(self.int_emb_size, use_bias=False, kernel_init=go(),
                         name="lin_sbf2")(sbf_p)
        x_kj = x_kj[idx_kj] * sbf_p

        t_p = nn.Dense(self.basis_emb_size_torsion, use_bias=False,
                       kernel_init=go(), name="lin_t1")(t)
        t_p = nn.Dense(self.int_emb_size, use_bias=False, kernel_init=go(),
                       name="lin_t2")(t_p)
        x_kj = x_kj * t_p

        x_kj = segment_sum(x_kj, idx_ji, num_edges, mask=t_mask)
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


def spherenet_geometry(batch: GraphBatch):
    """dist / angle / torsion from positions (xyz_to_dat numerics,
    spherenet_layer.py:496-561) over precomputed static indices."""
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
    q = tri.q_trip
    pos_j0 = pos[tri.idx_k][q] - pos[tri.idx_j][q]
    pos_ji_q = pos[tri.idx_i][q] - pos[tri.idx_j][q]
    pos_jk_q = pos[tri.q_kn] - pos[tri.idx_j][q]
    dist_ji = safe_norm(pos_ji_q, axis=-1)
    plane1 = jnp.cross(pos_ji_q, pos_j0)
    plane2 = jnp.cross(pos_ji_q, pos_jk_q)
    a_t = jnp.sum(plane1 * plane2, axis=-1)
    b_t = jnp.sum(jnp.cross(plane1, plane2) * pos_ji_q, axis=-1) / jnp.maximum(
        dist_ji, 1e-9
    )
    torsion1 = safe_arctan2(b_t, a_t)
    torsion1 = jnp.where(torsion1 <= 0, torsion1 + 2 * math.pi, torsion1)
    # The k_n == k candidate is exactly coplanar (torsion 2*pi); XLA's FMA
    # reassociation leaves b_t = +/-1e-9 which the 0/2pi fold amplifies to
    # O(2pi) noise — pin it to the exact value.
    degen = tri.q_kn == tri.idx_k[q]
    torsion1 = jnp.where(degen, 2 * math.pi, torsion1)
    num_t = tri.idx_i.shape[0]
    torsion = segment_min(torsion1, q, num_t, mask=tri.q_mask)
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

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        assert batch.triplets is not None and batch.triplets.q_trip is not None, (
            "SphereNet needs triplet+quad indices (with_quads=True)"
        )
        tri = batch.triplets
        dist, angle, torsion = spherenet_geometry(batch)

        rbf = DistEmb(self.num_radial, self.cutoff, self.envelope_exponent,
                      zero_outside=False, name="dist_emb")(dist)
        sbf = AngleEmb(self.num_spherical, self.num_radial, self.cutoff,
                       name="angle_emb")(dist, angle, tri.idx_kj)
        tbf = TorsionEmb(self.num_spherical, self.num_radial, self.cutoff,
                         name="torsion_emb")(dist, angle, torsion, tri.idx_kj)
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
                name=f"update_e_{blk}",
            )(e, emb, tri.idx_kj, tri.idx_ji, tri.t_mask)
            # NOTE: v is REPLACED each layer (spherenet.py:105), unlike
            # DimeNet's accumulated P
            v = SphereNetUpdateV(
                self.hidden_channels, self.out_emb_channels, self.out_dim,
                self.num_output_layers, self.output_init,
                name=f"update_v_{blk}",
            )(e, batch.receivers, batch.num_nodes, batch.edge_mask)

        return POOL[self.pool](v, batch)
