"""Dense linear algebra — TPU-native rebuild of /root/reference/src/la/.

Re-export surface mirrors /root/reference/src/la/index.js:19-63.
"""
from .norm import norm, norm_fro, safe_norm_2
from .eye_diag import eye, diag, diag_mat
from .permute import (permute_rows, permute_cols, unpermute_rows,
                      unpermute_cols, invert_permutation)
from .matmul import matmul, matmul2
from .tri import (tril, triu, tri_inv, tril_solve, triu_solve,
                  tril_t_solve, triu_t_solve)
from .lu import lu_decomp, lu_solve, lu_solve_fused
from .qr import (qr_decomp, qr_decomp_full, qr_lstsq, qr_solve,
                 qr_lstsq_fused)
from .rrqr import (rrqr_decomp, rrqr_decomp_full, rrqr_rank,
                   rrqr_solve, rrqr_lstsq)
from .singular_matrix_solve_error import SingularMatrixSolveError
from .svd_jac import (svd_jac_1sided, svd_jac_classic, svd_jac_2sided,
                      svd_jac_2sided_blocked)
from .svd import svd_decomp, svd_rank, svd_solve, svd_lstsq, rank, lstsq
from .solve import solve
from .det import det, slogdet, det_tri, slogdet_tri
from .eigh import eigh, eigh_jacobi, eigh_via_svd, eigh_tridiag_dc
from .hessenberg import hessenberg_decomp
from .schur import schur_decomp, schur_eigenvals, schur_eigen
from .eigen import eigen, eigenvals, eigen_balance_pre
from .bidiag import bidiag_decomp
from .srrqr import srrqr_decomp_full, srrqr_rank
from .urv import urv_decomp_full, urv_lstsq
from .pldlp import pldlp_decomp, pldlp_l, pldlp_d, pldlp_p, pldlp_solve
from .cholesky import cholesky_decomp, cholesky_solve
from .ldl import ldl_decomp, ldl_solve
from .misc import transpose_inplace
from ..rand.rng import rand_ortho
from .svd_dc import svd_dc
from .tridiag_dc import tridiag_eigh_dc
from .svd_block_jac import svd_jac_blocked
from .svd_gram import svd_gram
