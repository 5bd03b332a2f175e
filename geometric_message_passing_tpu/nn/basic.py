"""Scalar building blocks: activations and MLPs.

The MLP block structure (Linear -> Norm -> Act, repeated) mirrors the message/
update networks of the reference EGNN layer
(/root/reference/models/layers/egnn_layer.py:28-48).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


ACT = {
    "relu": nn.relu,
    "swish": nn.silu,
    "silu": nn.silu,
    "sigmoid": nn.sigmoid,
    "tanh": nn.tanh,
    "abs": jnp.abs,
    None: lambda x: x,
}


class LayerNorm(nn.Module):
    """Standard LayerNorm (torch.nn.LayerNorm semantics: affine, eps 1e-5)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5)(x)


class BatchNorm(nn.Module):
    """BatchNorm1d over the leading (node/edge) axis with running stats."""

    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura, momentum=0.9, epsilon=1e-5
        )(x)


# torch.nn.Linear's default reset_parameters: kaiming_uniform(a=sqrt(5)) on
# the weight == U(+-1/sqrt(fan_in)), and U(+-1/sqrt(fan_in)) on the bias.
# Used wherever the reference's counterpart is a raw torch Linear it never
# re-initializes (EGNN MLPs, the TFN/MACE edge-weight MLP + readout heads,
# every GVP perceptron) so the init distributions match the reference.
torch_linear_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MLP(nn.Module):
    """Linear/Norm/Act stack.

    hidden: sequence of layer widths (the output width is hidden[-1]).
    norm: None | 'layer' | 'batch' applied after every Linear except
    (optionally) the last; activation likewise.
    torch_init: initialize every Dense like torch.nn.Linear (the reference's
    Sequential MLPs never reset their Linears).
    """

    hidden: Sequence[int]
    activation: str = "relu"
    norm: Optional[str] = "layer"
    act_final: bool = True
    norm_final: bool = True
    # computation dtype of the LAST Dense (params stay f32 masters). Used by
    # the edge-TP conv to emit its giant per-edge weight tensor directly in
    # bf16 — no f32 boundary, so the backward pass over [E, ~94k] stays
    # bf16 end to end.
    final_dtype: Optional[str] = None
    torch_init: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = ACT[self.activation]
        n = len(self.hidden)
        for i, width in enumerate(self.hidden):
            dt = self.final_dtype if i == n - 1 else None
            if self.torch_init:
                x = nn.Dense(
                    width, dtype=dt,
                    kernel_init=torch_linear_kernel_init,
                    bias_init=torch_linear_bias_init(x.shape[-1]))(x)
            else:
                x = nn.Dense(width, dtype=dt)(x)
            last = i == n - 1
            if self.norm and (not last or self.norm_final):
                if self.norm == "layer":
                    x = nn.LayerNorm(epsilon=1e-5)(x)
                elif self.norm == "batch":
                    x = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9, epsilon=1e-5
                    )(x)
            if not last or self.act_final:
                x = act(x)
        return x


class RowParallelDense(nn.Module):
    """Dense layer whose INPUT dimension is sharded over a mesh axis
    (tensor parallelism): each shard holds the weight rows for its input
    slice, computes a partial product, and a psum over ``axis`` completes the
    contraction; bias is added after the psum so it is applied once.
    Parameter names (kernel/bias) match nn.Dense so a full model's weights
    row-slice directly onto the shards."""

    features: int
    axis: str

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        partial = x @ kernel
        return jax.lax.psum(partial, axis_name=self.axis) + bias
