from diffpure_tpu.solvers.em import sdeint_em, brownian_increment
from diffpure_tpu.solvers.ode import odeint_euler
from diffpure_tpu.solvers.adjoint import sdeint_em_adjoint, odeint_euler_adjoint

__all__ = [
    "sdeint_em", "brownian_increment",
    "odeint_euler",
    "sdeint_em_adjoint", "odeint_euler_adjoint",
]
