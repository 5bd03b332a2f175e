"""Model zoo — mirrors /root/reference/models/__init__.py:1-7 plus the MPNN
teaching baseline. DimeNetPPModel / SphereNetModel are imported lazily (they
pull in the triplet pipeline)."""

from .egnn import EGNNModel, MPNNModel  # noqa
from .egnn_fused import EGNNFusedModel  # noqa
from .gvpgnn import GVPGNNModel  # noqa
from .mace import MACEModel  # noqa
from .mace_ff import MACEForceField  # noqa
from .schnet import SchNetModel  # noqa
from .tfn import TFNModel  # noqa
from .tfn_ff import TFNForceField  # noqa

model_registry = {
    "schnet": SchNetModel,
    "egnn": EGNNModel,
    "egnn_fused": EGNNFusedModel,
    "gvp": GVPGNNModel,
    "tfn": TFNModel,
    "mace": MACEModel,
    "mace_ff": MACEForceField,
    "tfn_ff": TFNForceField,
    "mpnn": MPNNModel,
}

try:  # triplet-pipeline models
    from .dimenet import DimeNetPPModel  # noqa
    from .spherenet import SphereNetModel  # noqa

    model_registry["dimenet"] = DimeNetPPModel
    model_registry["spherenet"] = SphereNetModel
except ImportError:  # pragma: no cover - during incremental build only
    pass
