"""enoki_tpu.types -- composite math types (reference L3 layer).

Complex, Quaternion, Matrix (trailing-axes), homogeneous transforms, sRGB
color, spherical harmonics, Morton codes, PCG32 RNG (with emulated u64),
and magic-multiplier integer division.
"""

from . import u64  # noqa: F401
from .complex import Complex  # noqa: F401
from . import complex as complex_  # noqa: F401
from .quaternion import Quaternion  # noqa: F401
from . import quaternion  # noqa: F401
from . import matrix  # noqa: F401
from . import matrix_soa  # noqa: F401
from . import transform  # noqa: F401
from . import color  # noqa: F401
from . import sh  # noqa: F401
from .morton import morton_encode, morton_decode  # noqa: F401
from .random import PCG32, PCG32_DEFAULT_STATE, PCG32_DEFAULT_STREAM, PCG32_MULT  # noqa: F401
from .idiv import DivisorU32, DivisorI32, divisor  # noqa: F401
from . import half  # noqa: F401
from . import enum_array  # noqa: F401
