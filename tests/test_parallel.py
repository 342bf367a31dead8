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


def test_tensor_parallel_step_matches_data_parallel():
    """(data=2, model=2) sharded step == pure-DP step: tensor-parallel
    kernel sharding must not change the math (XLA inserts the collectives)."""
    from use_tpu.parallel.mesh import local_batch_to_global

    model = ScoreModel(
        backbone="ncsnpp", condition="noisy", sde_input="noisy",
        n_fft=126, hop_length=32, num_frames=16,
        backbone_kwargs=dict(nf=8, ch_mult=(1,), num_res_blocks=1),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optim.adam(lr=1e-3, weight_decay=0.0, params_example=params)
    step = make_sgmse_train_step(model, tx, accum=1, donate=False)
    key = jax.random.PRNGKey(7)

    rng = np.random.default_rng(1)
    batch = {
        "clean": rng.standard_normal((4, 1000)).astype(np.float32),
        "perturbed": rng.standard_normal((4, 1000)).astype(np.float32),
    }

    mesh_dp = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    st_dp = TrainState.create(
        jax.tree.map(lambda p: jax.device_put(p, replicated(mesh_dp)), params), tx
    )
    s1, m1 = step(st_dp, shard_batch(batch, mesh_dp), key)

    mesh_tp = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    tp_params = shard_params(params, mesh_tp, min_size=1 << 8)
    st_tp = TrainState.create(tp_params, tx)
    s2, m2 = step(st_tp, shard_batch(batch, mesh_tp), key)

    np.testing.assert_allclose(
        float(m1["loss_Score"]), float(m2["loss_Score"]), rtol=1e-5
    )
    diff = jax.tree.reduce(
        lambda a, b: max(a, b),
        jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params
        ),
    )
    assert diff < 1e-4, diff


def test_local_batch_to_global_single_process():
    """Per-host batch -> global sharded array (the per-rank DataLoader
    analog; single-process, all 8 devices are local)."""
    from use_tpu.parallel.mesh import local_batch_to_global

    mesh = make_mesh()
    local = {"clean": np.arange(8 * 10, dtype=np.float32).reshape(8, 10)}
    global_batch = local_batch_to_global(local, mesh)
    arr = global_batch["clean"]
    assert arr.shape == (8, 10)
    assert arr.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(arr), local["clean"])


def test_default_mesh_idle_policy():
    """default_mesh on_idle='error' refuses to idle more than half the
    slice with guidance; 'warn' keeps the reference-like degenerate
    acceptance (VERDICT r3 item 7)."""
    from use_tpu.parallel.mesh import default_mesh

    with pytest.raises(ValueError, match="batch_size=auto"):
        default_mesh(2, on_idle="error")  # 2 of 8 devices
    m = default_mesh(4, on_idle="error")  # exactly half: allowed
    assert m.shape["data"] == 4
    m = default_mesh(2, on_idle="warn")
    assert m.shape["data"] == 2
    m = default_mesh(8, on_idle="error")  # full slice
    assert m.shape["data"] == 8


def test_resolve_auto_batch():
    """data.batch_size=auto scales with the device count; accumulation
    shrinks to hold the recipe's effective batch (VERDICT r3 item 7)."""
    from use_tpu.cli.main import resolve_auto_batch

    def cfg():
        return {
            "data": {"batch_size": "auto", "micro_batch_per_device": 2},
            "train": {"accumulate_grad_batches": "auto", "effective_batch": 8},
        }

    c = cfg()
    resolve_auto_batch(c, 1)  # one chip: the exact reference recipe
    assert c["data"]["batch_size"] == 2
    assert c["train"]["accumulate_grad_batches"] == 4

    c = cfg()
    resolve_auto_batch(c, 4)  # 4 chips: batch 8, no accumulation needed
    assert c["data"]["batch_size"] == 8
    assert c["train"]["accumulate_grad_batches"] == 1

    c = cfg()
    resolve_auto_batch(c, 8)  # 8 chips: batch 16 exceeds the target
    assert c["data"]["batch_size"] == 16
    assert c["train"]["accumulate_grad_batches"] == 1

    # numeric values pass through untouched
    c = {"data": {"batch_size": 2}, "train": {"accumulate_grad_batches": 4}}
    resolve_auto_batch(c, 8)
    assert c["data"]["batch_size"] == 2
    assert c["train"]["accumulate_grad_batches"] == 4
