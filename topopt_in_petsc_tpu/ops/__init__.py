from topopt_in_petsc_tpu.ops.hex_operator import (
    gather_element_dofs,
    scatter_element_dofs,
    apply_hex_operator,
    hex_operator_diagonal,
    element_quadratic_form,
)

__all__ = [
    "gather_element_dofs",
    "scatter_element_dofs",
    "apply_hex_operator",
    "hex_operator_diagonal",
    "element_quadratic_form",
]
