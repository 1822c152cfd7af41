from rovit_kan_tpu.ops.spline import (  # noqa: F401
    make_knots,
    num_basis_functions,
    bspline_basis,
    kan_layer_apply,
)
from rovit_kan_tpu.ops.ordinal import (  # noqa: F401
    cumulative_to_class_probs,
    ordinal_expected_severity,
)
