from . import gf  # noqa: F401
from . import gf_numpy  # noqa: F401
from .b_field_element import BFieldElement, bfe, bfe_vec, bfe_array  # noqa: F401
from .x_field_element import (  # noqa: F401
    XFieldElement,
    EXTENSION_DEGREE,
    xfe,
    xfe_vec,
    xfe_array,
)
from . import ntt  # noqa: F401
