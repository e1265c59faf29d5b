from .tridiag import pcr_solve, residual_l1, thomas_solve, tridiag_matvec  # noqa: F401
