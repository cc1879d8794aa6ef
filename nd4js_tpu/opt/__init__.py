"""Nonlinear optimization — TPU-native rebuild of /root/reference/src/opt/.

Re-export surface mirrors /root/reference/src/opt/index.js:32-43.
Design translation (SURVEY.md §7 stage 7): the reference's infinite
generators remain available as ``*_gen`` python generators (one jitted
state transition per yield — the user owns convergence, exactly the
reference idiom), and every solver also ships a fully in-graph
``lax.while_loop`` driver for zero-dispatch TPU execution.
"""
from .num_grad import num_grad, num_grad_forward
from .root1d import root1d_bisect, root1d_brent, root1d_illinois
from .gss import min1d_gss
from .polyquad import roots1d_polyquad
from . import line_search
from .line_search import (albaali_fletcher, more_thuente_abc,
                          more_thuente_u123, strong_wolfe,
                          LineSearchError)
from .lbfgs import min_lbfgs_gen, lbfgs_minimize, lsq_lbfgs_gen, fit_lbfgs_gen
from .optimization_error import OptimizationNoProgressError
from .lm import lsq_lm_gen, lsq_lm, fit_lm_gen, fit_lm
from .dogleg import (lsq_dogleg_gen, lsq_dogleg, fit_dogleg_gen,
                     min_dogleg_gen, min_dogleg)
from .lbfgsb import min_lbfgsb_gen, lbfgsb_minimize
from .odr import (odr_lm_gen, odr_dogleg_gen, odr_lm, odr_dogleg,
                  tls_lm_gen, tls_dogleg_gen)
from .nelder_mead import min_nelder_mead_gen, min_nelder_mead
from .newton import root_newton_gen, root_newton
from .fit_lin import fit_lin
from . import test_fn
