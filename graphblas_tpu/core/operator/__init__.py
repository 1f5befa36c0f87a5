"""Operator subsystem (reference: graphblas/core/operator/).

Builtin op tables live in unary.py/binary.py/monoid.py/indexunary.py/
select.py; semirings compose lazily (semiring.py); aggregators are recipe
objects (agg.py); resolution helpers in utils.py.
"""

from .base import OpBase, ParameterizedUdf, TypedOpBase, find_opclass
from .binary import BinaryOp
from .indexunary import IndexUnaryOp
from .monoid import Monoid
from .select import SelectOp
from .semiring import Semiring
from .unary import UnaryOp
from .utils import get_semiring, get_typed_op

__all__ = [
    "OpBase",
    "TypedOpBase",
    "ParameterizedUdf",
    "UnaryOp",
    "BinaryOp",
    "Monoid",
    "Semiring",
    "IndexUnaryOp",
    "SelectOp",
    "find_opclass",
    "get_typed_op",
    "get_semiring",
]

# Names relocated under the `.ss` extension namespace, matching the reference
# (core/operator/base.py:21-85).  They exist and work on the TPU backend; the
# relocation is purely for API compatibility.
SS_UNARY_NAMES = frozenset(
    ["erf", "erfc", "frexpe", "frexpx", "lgamma", "tgamma",
     "positioni", "positioni1", "positionj", "positionj1"]
)
SS_BINARY_NAMES = frozenset(
    ["firsti", "firsti1", "firstj", "firstj1",
     "secondi", "secondi1", "secondj", "secondj1"]
)
POSITIONAL_MULT_NAMES = SS_BINARY_NAMES
