"""Worker process for the 2-process CPU ddp_sim test (VERDICT r3 item 2).

Launched twice by tests/test_ddp_sim.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set. Each process owns 4 virtual CPU
devices; together they form one 8-device JAX runtime — the analog of the
reference's ddp_spawn CPU simulation (configs/trainer/ddp_sim.yaml:1-9).

The worker:
  1. initializes the multi-process runtime through the PRODUCT code path
     (use_tpu.parallel.mesh.init_distributed),
  2. runs one real fit_sgmse epoch (mesh='auto') whose microbatches travel
     through place_batch -> local_batch_to_global ->
     make_array_from_process_local_data, feeding DIFFERENT per-process
     local shards,
  3. checks the per-host data-decorrelation seeds of DistortDataModule
     (datamodule.py process_index mixing, reference
     comm_distort_simu_dataset.py:235-238),
  4. writes a JSON report (param checksum, batch hash, device topology)
     the parent asserts on: identical post-step params across processes,
     different per-host batches.
"""
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # before any device use


def main() -> None:
    out_path = sys.argv[1]
    corpus_jsonl = sys.argv[2]

    from use_tpu.parallel.mesh import init_distributed

    init_distributed()
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 8, jax.devices()

    from use_tpu.engine.loop import fit_sgmse
    from use_tpu.models.sgmse.score_model import ScoreModel

    # -- per-host local shards: DIFFERENT data per process ----------------
    class DM:
        local_batch = 4

        def _gen(self, seed, n):
            rng = np.random.default_rng(seed)
            for _ in range(n):
                wav = 0.1 * rng.standard_normal((4, 992)).astype(np.float32)
                yield {"clean": wav,
                       "perturbed": wav + 0.01 * rng.standard_normal(
                           wav.shape).astype(np.float32)}

        def train_dataloader(self):
            return self._gen(100 + pid, 2)  # seed differs per process

        def val_dataloader(self):
            return self._gen(200 + pid, 1)

    model = ScoreModel(
        backbone="ncsnpp", sde="ouve", condition="noisy", sde_input="noisy",
        n_fft=126, hop_length=32, num_frames=32,
        backbone_kwargs=dict(nf=8, ch_mult=(1, 1), num_res_blocks=1),
    )
    res = fit_sgmse(
        model, DM(), lr=1e-3, accumulate_grad_batches=2, max_epochs=1,
        seed=0, mesh="auto",
    )
    # per-process checksum of the post-step params: DP demands equality
    leaves = jax.tree_util.tree_leaves(
        jax.tree.map(lambda x: np.asarray(x), res.state.params)
    )
    digest = hashlib.sha256()
    for leaf in leaves:
        digest.update(np.ascontiguousarray(leaf, dtype=np.float64).tobytes())
    param_hash = digest.hexdigest()

    # -- per-host data decorrelation through the REAL datamodule ----------
    from use_tpu.data.datamodule import DistortDataModule
    from use_tpu.data.distort_dataset import DistortConfig

    cfg = DistortConfig(
        clean_json_path=corpus_jsonl, noise_json_path=corpus_jsonl,
        speech_splice_seconds=1, reverb_use_FRA=True,
        min_duration_seconds=0.1,
    )
    dm = DistortDataModule(
        train_cfg=cfg, batch_size=4, num_workers=0, seed=0,
        world_size=jax.process_count(), process_index=pid,
    )
    first = next(iter(dm.train_dataloader()))
    batch_hash = hashlib.sha256(
        np.ascontiguousarray(first["perturbed"], np.float32).tobytes()
    ).hexdigest()

    with open(out_path, "w") as f:
        json.dump({
            "process_index": pid,
            "process_count": jax.process_count(),
            "global_devices": len(jax.devices()),
            "local_devices": len(jax.local_devices()),
            "param_hash": param_hash,
            "train_loss": float(res.history[0]["train/loss_Score"]),
            "val_loss": float(res.history[0]["val/loss_Score"]),
            "batch_hash": batch_hash,
            "local_batch_size": dm.local_batch,
        }, f)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
