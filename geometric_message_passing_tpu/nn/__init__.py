from .basic import ACT, MLP, BatchNorm, LayerNorm  # noqa
from .equivariant import (  # noqa
    Activation,
    EquivariantBatchNorm,
    Gate,
    IrrepsLinear,
    inverse_reshape_irreps,
    irreps2gate,
    merge_blocks,
    pad_to_irreps,
    reshape_irreps,
    split_blocks,
)
from .tensor_product import EdgeTensorProduct, edge_tensor_product  # noqa
from .symmetric_contraction import Contraction, SymmetricContraction  # noqa
from .conv import EquivariantProductBasisBlock, TensorProductConvLayer  # noqa
from . import gvp  # noqa
