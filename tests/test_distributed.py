"""Multi-PROCESS distributed runtime test (VERDICT r1 item 4): two
jax.distributed CPU processes (2 virtual devices each -> 4 global devices)
run one mesh-sharded train step through core/distributed.py's
initialize / process_shard / host_local_batch_to_global, and must agree
with each other and with the single-process result."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same step on the in-process (8-virtual-device) backend, 4-device mesh."""
    import jax

    from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
    from ikea_recommender_tpu.core.mesh import MeshSpec, make_mesh
    from ikea_recommender_tpu.models.families import model_config_from_train
    from ikea_recommender_tpu.parallel.sharding import (
        make_sharded_train_step,
        shard_state,
    )
    from ikea_recommender_tpu.train.state import make_optimizer, make_train_state
    from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step
    from tests._distributed_worker import make_global_batch

    mesh = make_mesh(MeshSpec(data=2, model=2), devices=jax.devices()[:4])
    A, T, B = 24, 5, 16
    tc = TrainConfig(
        model="gru4rec", embedding_size=8, hidden_state_size=8, state_size=T
    )
    mc = model_config_from_train(tc, DataConfig(num_items=A), align=2)
    opt = make_optimizer(0.01)
    state, _ = make_train_state(jax.random.key(0), mc, 0.01)
    batch = make_global_batch(B, A, T)
    raw = make_train_step(mc, opt, RLStepConfig(), jit=False)
    step = make_sharded_train_step(raw, mesh, state, batch)
    new_state, metrics = step(shard_state(state, mesh), batch)
    emb_sum = float(
        np.asarray(new_state.params["backbone"]["embedding"], dtype=np.float32).sum()
    )
    return float(metrics["sup_loss"]), emb_sum


def test_two_process_sharded_step_matches_single_process(tmp_path):
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the worker pins its own JAX_PLATFORMS/XLA_FLAGS before importing jax
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                rec = json.loads(line[len("RESULT "):])
                results[rec["pid"]] = rec
    assert set(results) == {0, 1}, f"missing results: {outs}"

    # both processes see the SAME replicated metrics
    np.testing.assert_allclose(
        results[0]["sup_loss"], results[1]["sup_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(
        results[0]["emb_sum"], results[1]["emb_sum"], rtol=1e-6
    )

    ref_loss, ref_emb = _single_process_reference()
    np.testing.assert_allclose(results[0]["sup_loss"], ref_loss, rtol=1e-4)
    np.testing.assert_allclose(results[0]["emb_sum"], ref_emb, rtol=1e-4)


_TRAINER_WORKER = os.path.join(_REPO, "tests", "_trainer_distributed_worker.py")


def _single_process_trainer_reference():
    """Same config through run.trainer.train on the in-process backend with
    the SAME process-sharded sampling semantics (one process holding all
    four data shards)."""
    import importlib.util
    import tempfile

    spec = importlib.util.spec_from_file_location("_tw", _TRAINER_WORKER)
    tw = importlib.util.module_from_spec(spec)
    # stop the module body from re-initializing jax.distributed, and give
    # it a clean 4-element argv (the module parses optional argv[4:] — with
    # pytest's own argv it would int() a test-file path)
    # force backend init NOW with conftest's 8-device flags — the worker
    # body appends device_count=2 to XLA_FLAGS, which must stay a no-op
    import jax

    jax.devices()
    argv_backup = sys.argv
    sys.argv = [_TRAINER_WORKER, "localhost:0", "1", "0"]
    try:
        src = open(_TRAINER_WORKER).read()
        src = src.replace("coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])", "coordinator, nprocs, pid = None, 1, 0")
        src = src.replace("jax.distributed.initialize(\n    coordinator_address=coordinator, num_processes=nprocs, process_id=pid\n)", "")
        exec(compile(src, _TRAINER_WORKER, "exec"), tw.__dict__)
    finally:
        sys.argv = argv_backup

    from ikea_recommender_tpu.data.synthetic import synthetic_buffers
    from ikea_recommender_tpu.run.trainer import train

    train_buf, _ = synthetic_buffers(num_sessions=30, num_items=32, state_len=6, seed=1)
    _, val_buf = synthetic_buffers(num_sessions=10, num_items=32, state_len=6, seed=2)
    with tempfile.TemporaryDirectory() as tmp:
        out = train(tw.build_config(tmp), train_buf=train_buf, val_buf=val_buf)
    return float(out.best_metric), float(
        out.test_metrics.get("Best_Val_NDCG@10", -1.0)
    )


def test_two_process_trainer_matches_single_process(tmp_path):
    """VERDICT r2 item 4: the PRODUCT surface (config -> run.trainer.train)
    runs multi-process — per-process buffer shards, shard-local sampling,
    multi-host-safe state init, replicated best-model tracking — and its
    metrics match a single-process run with identical sampling semantics."""
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _TRAINER_WORKER, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"trainer worker failed:\n{out}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                rec = json.loads(line[len("RESULT "):])
                results[rec["pid"]] = rec
    assert set(results) == {0, 1}, f"missing results: {outs}"

    # both processes report identical (replicated) metrics
    np.testing.assert_allclose(results[0]["best"], results[1]["best"], rtol=1e-6)
    np.testing.assert_allclose(
        results[0]["test_ndcg"], results[1]["test_ndcg"], rtol=1e-6
    )

    ref_best, ref_test = _single_process_trainer_reference()
    np.testing.assert_allclose(results[0]["best"], ref_best, rtol=1e-4)
    np.testing.assert_allclose(results[0]["test_ndcg"], ref_test, rtol=1e-4)


def _run_trainer_pair(extra_args, timeout=480):
    """Launch the 2-process trainer worker with extra argv; -> results by pid."""
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _TRAINER_WORKER, coordinator, "2", str(pid)]
            + [str(a) for a in extra_args],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"trainer worker failed:\n{out}"
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                rec = json.loads(line[len("RESULT "):])
                results[rec["pid"]] = rec
    assert set(results) == {0, 1}, f"missing results: {outs}"
    return results


def test_two_process_checkpoint_resume_matches_uninterrupted(tmp_path):
    """VERDICT r3 item 3: multi-process orbax checkpoint/resume. Phase 1
    trains one epoch with a checkpoint dir (the 'killed after epoch 1'
    run), phase 2 resumes from it and finishes epoch 2; the final val
    metric must match an uninterrupted 2-process 2-epoch run exactly
    (same per-epoch sampling streams, bit-restored state)."""
    ckpt = str(tmp_path / "ckpt")
    exp1 = str(tmp_path / "exp_resume")
    os.makedirs(exp1, exist_ok=True)
    _run_trainer_pair([1, ckpt, 0, exp1])  # phase 1: epoch 0 + checkpoint
    resumed = _run_trainer_pair([2, ckpt, 1, exp1])  # phase 2: resume, epoch 1

    exp2 = str(tmp_path / "exp_straight")
    os.makedirs(exp2, exist_ok=True)
    straight = _run_trainer_pair([2, "", 0, exp2])  # uninterrupted 2 epochs

    # replicated across processes
    np.testing.assert_allclose(
        resumed[0]["last_val_ndcg"], resumed[1]["last_val_ndcg"], rtol=1e-6
    )
    # the resumed run's FINAL eval point equals the uninterrupted run's
    # (pure function of the final state)
    np.testing.assert_allclose(
        resumed[0]["last_val_ndcg"], straight[0]["last_val_ndcg"], rtol=1e-6
    )
    # the best-model tracker rides in the checkpoint (r5): the resumed
    # run's whole-run best AND its best-model test eval equal the
    # uninterrupted run's — a resume can no longer change which model ships
    np.testing.assert_allclose(resumed[0]["best"], straight[0]["best"], rtol=1e-6)
    np.testing.assert_allclose(
        resumed[0]["test_ndcg"], straight[0]["test_ndcg"], rtol=1e-6
    )
