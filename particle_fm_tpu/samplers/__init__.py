from particle_fm_tpu.samplers.ode import odeint_fixed, odeint_dopri5
from particle_fm_tpu.samplers.sde import euler_maruyama_sampler, ddim_sampler

__all__ = ["odeint_fixed", "odeint_dopri5", "euler_maruyama_sampler", "ddim_sampler"]
