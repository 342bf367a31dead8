"""Parallel layer: mesh construction, batch sharding, TP param sharding, and
a data-parallel train step on the 8-device CPU mesh (the ddp_sim analog)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from use_tpu.engine import optim
from use_tpu.engine.state import TrainState
from use_tpu.engine.train import make_sgmse_train_step
from use_tpu.models.sgmse.score_model import ScoreModel
from use_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from use_tpu.parallel.sharding import params_shardings, shard_params


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    with pytest.raises(AssertionError):
        make_mesh(data=3, model=3)


def test_shard_batch_places_data_axis():
    mesh = make_mesh()
    batch = {"clean": np.zeros((8, 100), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["clean"].sharding.spec == P("data")
    # each device holds 1/8 of the batch
    assert sharded["clean"].addressable_shards[0].data.shape == (1, 100)


def test_param_sharding_rules():
    mesh = make_mesh(model=2)
    params = {
        "big": {"kernel": jnp.zeros((3, 3, 128, 256))},
        "small": {"kernel": jnp.zeros((1, 1, 4, 4)), "bias": jnp.zeros((4,))},
        "odd": {"kernel": jnp.zeros((3, 3, 128, 255))},  # not divisible
    }
    sharded = shard_params(params, mesh, min_size=1 << 10)
    assert sharded["big"]["kernel"].sharding.spec == P(None, None, None, "model")
    assert sharded["small"]["kernel"].sharding.spec == P()
    assert sharded["odd"]["kernel"].sharding.spec == P()  # fell back


def test_data_parallel_train_step_matches_single_device():
    """DP gradient step over the 8-device mesh == single-device step."""
    model = ScoreModel(
        backbone="ncsnpp", condition="noisy", sde_input="noisy",
        n_fft=126, hop_length=32, num_frames=16,
        backbone_kwargs=dict(nf=8, ch_mult=(1,), num_res_blocks=1),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optim.adam(lr=1e-3, weight_decay=0.0, params_example=params)

    rng = np.random.default_rng(0)
    batch = {
        "clean": rng.standard_normal((8, 1000)).astype(np.float32),
        "perturbed": rng.standard_normal((8, 1000)).astype(np.float32),
    }
    step = make_sgmse_train_step(model, tx, accum=1, donate=False)
    key = jax.random.PRNGKey(7)

    # single device
    state1 = TrainState.create(params, tx)
    s1, m1 = step(state1, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    # 8-way data parallel
    mesh = make_mesh()
    state2 = TrainState.create(
        jax.tree.map(lambda p: jax.device_put(p, replicated(mesh)), params), tx
    )
    sharded = shard_batch(batch, mesh)
    s2, m2 = step(state2, sharded, key)

    np.testing.assert_allclose(float(m1["loss_Score"]), float(m2["loss_Score"]), rtol=1e-5)
    diff = jax.tree.reduce(
        lambda a, b: max(a, b),
        jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params
        ),
    )
    assert diff < 1e-5, diff
