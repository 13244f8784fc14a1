"""Train state: params + batch stats + optimizer state, one pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )


def create_train_state(model, tx, sample_batch, rng) -> TrainState:
    import jax.numpy as jnp

    params_rng, dropout_rng = jax.random.split(rng)
    # jit the init: eager initialization dispatches hundreds of tiny ops
    # (minutes over a remote-tunnel TPU); one compiled program is seconds.
    init = jax.jit(lambda rngs, batch: model.init(rngs, batch, train=True))
    variables = init({"params": params_rng, "dropout": dropout_rng}, sample_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
