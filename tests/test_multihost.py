"""Multi-host correctness: per-process stream sharding, global-array
staging, and a REAL 2-process CPU cluster running train.py's
jax.distributed branch, compared against a single-process run.

This covers the pod-slice config (BASELINE.json:11, SURVEY.md §2.4
"Distributed comm backend"): batches are assembled from process-local
rows with jax.make_array_from_process_local_data, the carried TBPTT
decoder state is gathered tiled for checkpointing, and only process 0
writes checkpoint files.
"""

import itertools
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # real 2-process gloo clusters (~4 min)

from parrot_tpu.config import DataConfig
from parrot_tpu.data import H5Corpus, make_fixture_corpus, parrot_stream
from parrot_tpu.parallel import (batch_sharding, make_mesh, stage_global,
                                 stage_local, state_sharding)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mh") / "fix.h5")
    make_fixture_corpus(path, num_utterances=24, vocab_size=11,
                        frame_size=7, frames_per_char=3, num_speakers=2,
                        seed=3)
    return path


def _cfg(batch_size=8):
    return DataConfig(batch_size=batch_size, seq_size=8, max_text_len=16,
                      sort_pool_size=2, shuffle_seed=5)


def test_stream_process_sharding_matches_global(corpus_path):
    """Each process's stream must yield exactly its row block of the
    global batch, with identical segment boundaries and start flags."""
    corpus = H5Corpus(corpus_path)
    cfg = _cfg()
    n_batches = 6
    full = list(itertools.islice(
        parrot_stream(corpus, cfg, "train", epochs=1), n_batches))
    pc = 2
    per = cfg.batch_size // pc
    for pi in range(pc):
        local = list(itertools.islice(
            parrot_stream(corpus, cfg, "train", epochs=1,
                          process_index=pi, process_count=pc), n_batches))
        assert len(local) == len(full)
        for g, l in zip(full, local):
            for name in g._fields:
                gv, lv = np.asarray(getattr(g, name)), np.asarray(
                    getattr(l, name))
                if gv.ndim == 0:
                    np.testing.assert_array_equal(gv, lv)  # start_flag
                else:
                    assert lv.shape[0] == per
                    np.testing.assert_array_equal(
                        gv[pi * per:(pi + 1) * per], lv)


def test_stage_single_process_equals_device_put(corpus_path):
    """On one process, stage_local/stage_global degrade to device_put."""
    corpus = H5Corpus(corpus_path)
    cfg = _cfg()
    mesh = make_mesh(8)
    batch = next(iter(parrot_stream(corpus, cfg, "train", epochs=1)))
    sh = batch_sharding(mesh, batch)
    a = stage_local(batch, sh)
    b = jax.device_put(batch, sh)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert x.sharding == y.sharding
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    st = {"k": np.arange(16, dtype=np.float32).reshape(8, 2)}
    st_sh = state_sharding(mesh, st)
    g = stage_global(st, st_sh)
    np.testing.assert_array_equal(np.asarray(g["k"]), st["k"])
    assert g["k"].sharding == st_sh["k"]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _train_flags(corpus_path, save_dir, name):
    return ["--model_name", name, "--dataset", corpus_path,
            "--save_dir", save_dir,
            "--batch_size", "8", "--seq_size", "8", "--max_text_len", "16",
            "--rnn_h_dim", "16", "--readouts_dim", "16",
            "--encoder_dim", "8", "--embed_dim", "8",
            "--decoder_layers", "2", "--attention_mixtures", "2",
            "--num_mixtures", "2", "--num_steps", "4",
            "--eval_every", "2", "--save_every", "0",
            "--log_every", "1", "--seed", "7"]


def _load_latest(save_dir, name):
    root = os.path.join(save_dir, name)
    step_dir = os.path.join(root, open(os.path.join(root, "latest")).read()
                            .strip())
    with np.load(os.path.join(step_dir, "arrays.npz")) as z:
        return {k: z[k] for k in z.files}


def test_two_process_train_matches_single_process(corpus_path, tmp_path):
    """Launch train.py twice as a genuine 2-process JAX CPU cluster
    (gloo collectives, 4 virtual devices each) and once single-process
    (8 virtual devices); final checkpoints must agree."""
    port = _free_port()
    base_env = dict(os.environ)
    base_env.pop("PALLAS_AXON_POOL_IPS", None)
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"

    def run(name, n_local_devices, dist_env, save_dir):
        env = dict(base_env)
        flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                         if "device_count" not in f)
        env["XLA_FLAGS"] = (f"{flags} --xla_force_host_platform_"
                            f"device_count={n_local_devices}").strip()
        env.update(dist_env)
        return subprocess.Popen(
            [sys.executable, "train.py"] + _train_flags(
                corpus_path, save_dir, name),
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)

    single_dir = str(tmp_path / "single")
    multi_dir = str(tmp_path / "multi")
    procs = [run("m", 8, {}, single_dir)]
    for pid in range(2):
        procs.append(run("m", 4, {
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        }, multi_dir))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, f"trainer failed:\n{out[-3000:]}"

    single = _load_latest(single_dir, "m")
    multi = _load_latest(multi_dir, "m")
    assert set(single) == set(multi)
    for k in sorted(single):
        np.testing.assert_allclose(
            single[k], multi[k], rtol=2e-4, atol=2e-5,
            err_msg=f"checkpoint array {k} diverged between single- and "
                    f"two-process training")


def test_two_process_pallas_train_matches_single_process(corpus_path,
                                                         tmp_path):
    """The pod-slice step type (shard_map + per-device pallas kernels)
    under a REAL 2-process gloo cluster (VERDICT r4 next-step #7): the
    previous cluster tests ran the GSPMD path only (--pallas_scan AUTO
    resolves OFF on CPU). Force --pallas_scan (interpret-mode kernels
    on CPU) on both a 2-process x 4-device cluster and a single-process
    8-device run — each device runs its own pallas_call on local rows
    with explicit psum'd grads (train/loop.py grads_body) — and assert
    checkpoint equality. Closes the last untested corner of the
    config-5 matrix (BASELINE.json:11)."""
    port = _free_port()
    base_env = dict(os.environ)
    base_env.pop("PALLAS_AXON_POOL_IPS", None)
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"

    def run(name, n_local_devices, dist_env, save_dir):
        env = dict(base_env)
        flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                         if "device_count" not in f)
        env["XLA_FLAGS"] = (f"{flags} --xla_force_host_platform_"
                            f"device_count={n_local_devices}").strip()
        env.update(dist_env)
        return subprocess.Popen(
            [sys.executable, "train.py", "--pallas_scan"]
            + _train_flags(corpus_path, save_dir, name),
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)

    single_dir = str(tmp_path / "psingle")
    multi_dir = str(tmp_path / "pmulti")
    procs = [run("m", 8, {}, single_dir)]
    for pid in range(2):
        procs.append(run("m", 4, {
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        }, multi_dir))
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"pallas trainer failed:\n{out[-3000:]}"
        assert "shard_map per-device step" in out

    single = _load_latest(single_dir, "m")
    multi = _load_latest(multi_dir, "m")
    assert set(single) == set(multi)
    for k in sorted(single):
        np.testing.assert_allclose(
            single[k], multi[k], rtol=2e-4, atol=2e-5,
            err_msg=f"checkpoint array {k} diverged between single- and "
                    f"two-process pallas shard_map training")


def test_two_process_save_resume_matches_uninterrupted(corpus_path,
                                                       tmp_path):
    """Train 2 steps on the 2-process cluster, save, then RESUME on a
    fresh 2-process cluster for 2 more steps — final checkpoint must
    match a single-process run of all 4 steps. Exercises the multi-host
    restore staging (stage_local params, stage_global dstate) and the
    stream fast-forward under per-process sharding."""
    base_env = dict(os.environ)
    base_env.pop("PALLAS_AXON_POOL_IPS", None)
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"

    def flags(save_dir, steps, resume=False):
        f = _train_flags(corpus_path, save_dir, "m")
        f[f.index("--num_steps") + 1] = str(steps)
        return f + (["--resume"] if resume else [])

    def run_cluster(save_dir, steps, resume):
        port = _free_port()
        procs = []
        for pid in range(2):
            env = dict(base_env)
            xla = " ".join(x for x in env.get("XLA_FLAGS", "").split()
                           if "device_count" not in x)
            env["XLA_FLAGS"] = \
                f"{xla} --xla_force_host_platform_device_count=4".strip()
            env.update({"JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                        "JAX_NUM_PROCESSES": "2",
                        "JAX_PROCESS_ID": str(pid)})
            procs.append(subprocess.Popen(
                [sys.executable, "train.py"] + flags(save_dir, steps,
                                                     resume),
                cwd=REPO, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        for p in procs:
            out, _ = p.communicate(timeout=420)
            assert p.returncode == 0, f"trainer failed:\n{out[-3000:]}"

    def run_single(save_dir, steps):
        env = dict(base_env)
        xla = " ".join(x for x in env.get("XLA_FLAGS", "").split()
                       if "device_count" not in x)
        env["XLA_FLAGS"] = \
            f"{xla} --xla_force_host_platform_device_count=8".strip()
        r = subprocess.run(
            [sys.executable, "train.py"] + flags(save_dir, steps),
            cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
        assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]

    multi_dir = str(tmp_path / "multi")
    run_cluster(multi_dir, steps=2, resume=False)
    run_cluster(multi_dir, steps=4, resume=True)
    single_dir = str(tmp_path / "single")
    run_single(single_dir, steps=4)

    single = _load_latest(single_dir, "m")
    multi = _load_latest(multi_dir, "m")
    assert set(single) == set(multi)
    for k in sorted(single):
        np.testing.assert_allclose(
            single[k], multi[k], rtol=2e-4, atol=2e-5,
            err_msg=f"{k} diverged after 2-process save/resume")


def test_two_process_preemption_sigterm_one_host(corpus_path, tmp_path):
    """SIGTERM delivered to ONLY ONE process of a live 2-process cluster:
    the interrupt decision is collective (Trainer._check_interrupted
    allgathers the flag every step), so BOTH processes must leave the
    loop at the same step, write one coherent checkpoint, and exit 0 —
    then a fresh cluster must resume from it. Without the collective
    check the un-signalled peer keeps issuing train-step collectives
    against the signalled one's checkpoint gather and the cluster hangs."""
    import signal
    import time

    base_env = dict(os.environ)
    base_env.pop("PALLAS_AXON_POOL_IPS", None)
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    save_dir = str(tmp_path / "sm")

    def flags(steps, resume=False):
        f = _train_flags(corpus_path, save_dir, "m")
        f[f.index("--num_steps") + 1] = str(steps)
        f[f.index("--eval_every") + 1] = "0"
        return f + (["--resume"] if resume else [])

    def launch(pid, port, steps, resume=False):
        env = dict(base_env)
        xla = " ".join(x for x in env.get("XLA_FLAGS", "").split()
                       if "device_count" not in x)
        env["XLA_FLAGS"] = \
            f"{xla} --xla_force_host_platform_device_count=4".strip()
        env.update({"JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                    "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": str(pid)})
        return subprocess.Popen(
            [sys.executable, "train.py"] + flags(steps, resume),
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)

    port = _free_port()
    procs = [launch(0, port, steps=5000), launch(1, port, steps=5000)]
    # wait until training is demonstrably under way (process 0 logs)
    metrics = os.path.join(save_dir, "m", "metrics.jsonl")
    deadline = time.time() + 180
    while time.time() < deadline:
        if os.path.exists(metrics) and \
                '"kind": "train"' in open(metrics).read():
            break
        if any(p.poll() is not None for p in procs):
            outs = [p.communicate()[0] for p in procs]
            raise AssertionError(f"trainer died early:\n{outs[0][-2000:]}"
                                 f"\n{outs[1][-2000:]}")
        time.sleep(0.5)
    else:
        for p in procs:
            p.kill()
        raise AssertionError("training never reached a logged step")

    procs[1].send_signal(signal.SIGTERM)  # NOT the checkpoint writer
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 0, f"post-SIGTERM exit:\n{out[-3000:]}"

    ckpt = _load_latest(save_dir, "m")
    assert any(k.startswith("dstate/") for k in ckpt)
    root = os.path.join(save_dir, "m")
    step_dir = open(os.path.join(root, "latest")).read().strip()
    step = int(step_dir.split("_")[1])
    assert 0 < step < 5000

    # elastic recovery: fresh cluster resumes and advances
    port = _free_port()
    procs = [launch(0, port, steps=step + 3, resume=True),
             launch(1, port, steps=step + 3, resume=True)]
    for p in procs:
        out, _ = p.communicate(timeout=180)
        assert p.returncode == 0, f"resume failed:\n{out[-3000:]}"
    step_dir2 = open(os.path.join(root, "latest")).read().strip()
    assert int(step_dir2.split("_")[1]) == step + 3


@pytest.fixture(scope="module")
def audio_corpus_path(tmp_path_factory):
    from parrot_tpu.data.fixture import make_audio_fixture_corpus
    path = str(tmp_path_factory.mktemp("mh_voc") / "audio.h5")
    make_audio_fixture_corpus(path, num_utterances=10, vocab_size=5)
    return path


def test_two_process_vocoder_train_matches_single(audio_corpus_path,
                                                  tmp_path):
    """train_vocoder.py on a genuine 2-process JAX CPU cluster (gloo)
    vs single-process: final checkpoints must agree — proves the
    vocoder trainer's per-process stream sharding, stage_local batch
    staging, and gathered-dstate saves are multi-host-correct."""
    base_env = dict(os.environ)
    base_env.pop("PALLAS_AXON_POOL_IPS", None)
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    vflags = ["--dataset", audio_corpus_path,
              "--model_name", "v", "--batch_size", "4", "--seq_size", "8",
              "--rnn_dim", "16", "--mlp_dim", "16", "--embed_dim", "8",
              "--num_steps", "4", "--eval_every", "0", "--save_every", "0",
              "--log_every", "1", "--seed", "7"]

    def run(n_local_devices, dist_env, save_dir):
        env = dict(base_env)
        xla = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                       if "device_count" not in f)
        env["XLA_FLAGS"] = (f"{xla} --xla_force_host_platform_"
                            f"device_count={n_local_devices}").strip()
        env.update(dist_env)
        return subprocess.Popen(
            [sys.executable, "train_vocoder.py", "--save_dir", save_dir]
            + vflags,
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)

    port = _free_port()
    single_dir = str(tmp_path / "vsingle")
    multi_dir = str(tmp_path / "vmulti")
    procs = [run(4, {}, single_dir)]
    for pid in range(2):
        procs.append(run(2, {
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        }, multi_dir))
    for p in procs:
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, f"vocoder trainer failed:\n{out[-3000:]}"

    single = _load_latest(single_dir, "v")
    multi = _load_latest(multi_dir, "v")
    assert set(single) == set(multi)
    for k in sorted(single):
        np.testing.assert_allclose(
            single[k], multi[k], rtol=2e-4, atol=2e-5,
            err_msg=f"vocoder checkpoint array {k} diverged")
