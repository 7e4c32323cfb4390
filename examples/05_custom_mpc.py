"""Build a custom nonlinear MPC on the SQP engine: supply any discrete step
function; jacfwd linearisation, equilibrated ADMM, warm starts come free."""

import jax
import jax.numpy as jnp

from unmanned_aerial_vehicles_tpu.control import QuadCost, SQPConfig, SQPMPC
from unmanned_aerial_vehicles_tpu.utils import scaled

# a toy 2D unicycle: state [x, y, heading], control [speed, turn rate]
DT = 0.1


def unicycle_step(x, u, residual):
    dx = jnp.stack([u[0] * jnp.cos(x[2]), u[0] * jnp.sin(x[2]), u[1]])
    return x + DT * (dx + residual)


mpc = SQPMPC(
    unicycle_step,
    state_dim=3,
    control_dim=2,
    config=SQPConfig(horizon=20, sqp_iterations=3, admm_iterations=60),
    state_lower=[-10, -10, -100], state_upper=[10, 10, 100],
    control_lower=[0.0, -2.0], control_upper=[2.0, 2.0],
    dtype=jnp.float64,
)
cost = QuadCost(
    q_stage=jnp.asarray([5.0, 5.0, 0.1]),
    q_terminal=jnp.asarray([50.0, 50.0, 1.0]),
    r_control=jnp.asarray([0.1, 0.1]),
    u_ref=jnp.zeros(2),
)

state = jnp.asarray([0.0, 0.0, 0.0])
target = jnp.asarray([3.0, 2.0, 0.0])
x_ref = jnp.tile(target[None, :], (20, 1))

carry = mpc.init_carry(state, jnp.asarray([1.0, 0.0]))

@jax.jit
def drive(state, carry):
    def step(c, _):
        st, mc = c
        u, _, mc = mpc.solve(mc, st, cost, x_ref)
        st = unicycle_step(st, u, jnp.zeros(3))
        return (st, mc), st

    (final, _), path = jax.lax.scan(step, (state, carry), None,
                                    length=scaled(80, 30))
    return final, path

final, path = drive(state, carry)
print("final position:", [round(float(v), 3) for v in final[:2]],
      "(target", [float(v) for v in target[:2]], ")")
