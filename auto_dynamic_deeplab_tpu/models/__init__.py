from .cell import FixedCell, as_genotype_rows, edge_op_assignment
from .decoded import ADD, EDM, AutoDeepLab, BaselineModel, DecodedNet

__all__ = [
    "ADD",
    "EDM",
    "AutoDeepLab",
    "BaselineModel",
    "DecodedNet",
    "FixedCell",
    "as_genotype_rows",
    "edge_op_assignment",
]

from .path_supernet import ModelBaselinePathSearch, ModelNetSearch, ModelSearch
from .supernet import TrellisSupernet, normalize_betas
from .supernet_cell import MixedOp, TrellisCell

__all__ += [
    "MixedOp",
    "ModelBaselinePathSearch",
    "ModelNetSearch",
    "ModelSearch",
    "TrellisCell",
    "TrellisSupernet",
    "normalize_betas",
]
