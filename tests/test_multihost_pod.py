"""Two-process pod test: the multi-host branch of the search loop.

Spawns a real 2-process JAX distributed CPU pod (coordinator + worker)
running one full train cycle each. This exercises the process_count>1 paths
of parallel/distributed.py (initialize, host_shard striding, barrier) and
the eval-shard / barrier / coordinator-write sequencing in
genetic/train.py — previously only verified anecdotally (VERDICT r1 weak
item 4).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent

BOOT = (
    "import jax\n"
    "jax.config.update('jax_platforms', 'cpu')\n"
    "from ecad_tpu.genetic.train import main\n"
    "main({argv!r})\n"
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_hybrid_dcn_ici_mesh_train_cycle(tmp_path):
    """The actual pod shape from parallel/distributed.py step 2: a mesh
    spanning 2 processes × 4 local devices (dp=2 rides DCN across the
    processes, tp=4 rides ICI within each). One full train cycle with the
    device-side fidelity scorer: every process executes EVERY candidate's
    SPMD program in lockstep (cooperative regime of
    evaluate_generation), per-image scores cross the process boundary via
    process_allgather, and only the coordinator writes artifacts."""
    pops = tmp_path / "pops"
    bench = tmp_path / "bench"
    argv = [
        "--name", "hybrid", "--tiny-model", "--scorer", "fidelity",
        "--random-seed-gen-0", "--population-size", "3",
        "--num-cycles", "1", "--num-inference-steps", "2",
        "--num-prompts", "2", "--dp", "2", "--tp", "4",
        "--populations-dir", str(pops), "--benchmarks-dir", str(bench),
    ]
    port = _free_port()
    boot = BOOT.format(argv=argv) + (
        "import jax\nprint('DEVICES=%d' % jax.device_count())\n"
    )
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", boot],
                env=env,
                cwd=REPO_ROOT,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    # the mesh spans both processes: 8 global devices on each
    assert "DEVICES=8" in outs[0] and "DEVICES=8" in outs[1]

    # cooperative regime: BOTH processes executed every candidate (vs the
    # work-sharded test below where each does only its stride)
    for out in outs:
        for i in range(3):
            assert f"cand_{i:03d}" in out, out[-2000:]

    # complete artifacts, written once by the coordinator
    gen1 = bench / "hybrid" / "gen_001" / "candidates"
    scores = sorted(gen1.glob("cand_*/scores.json"))
    assert len(scores) == 3, sorted(gen1.rglob("*"))
    for f in scores:
        total = json.loads(f.read_text())["total_score"]
        assert 0.0 < total <= 200.0  # real SNR-dB fidelity values

    gen2 = pops / "hybrid" / "gen_002" / "candidates"
    assert len(list(gen2.glob("cand_*.json"))) == 3
    assert "Generation 2 saved" in outs[0]


def test_two_process_pod_train_cycle(tmp_path):
    pops = tmp_path / "pops"
    bench = tmp_path / "bench"
    argv = [
        "--name", "pod", "--tiny-model", "--scorer", "mock",
        "--random-seed-gen-0", "--population-size", "4",
        "--num-cycles", "1", "--num-inference-steps", "2",
        "--num-prompts", "2", "--eval-mode", "stepwise",
        "--populations-dir", str(pops), "--benchmarks-dir", str(bench),
    ]
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", BOOT.format(argv=argv)],
                env=env,
                cwd=REPO_ROOT,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    # work sharding: strided by process index — proc 0 evaluated the even
    # candidates, proc 1 the odd ones, neither did the other's
    assert "cand_000" in outs[0] and "cand_002" in outs[0]
    assert "cand_001" in outs[1] and "cand_003" in outs[1]
    assert "cand_001" not in outs[0] and "cand_000" not in outs[1]

    # all four candidates scored; MACs written (coordinator pass)
    gen1 = bench / "pod" / "gen_001" / "candidates"
    scores = sorted(gen1.glob("cand_*/scores.json"))
    assert len(scores) == 4, sorted(gen1.rglob("*"))
    for i, f in enumerate(scores):
        data = json.loads(f.read_text())
        assert "total_score" in data
    cand_jsons = sorted(
        (pops / "pod" / "gen_001" / "candidates").glob("cand_*.json")
    )
    assert len(cand_jsons) == 4
    assert all(
        "total_macs_T" in json.loads(c.read_text())["metrics"]
        for c in cand_jsons
    )

    # the coordinator (and only it) advanced the run: next generation saved
    gen2 = pops / "pod" / "gen_002" / "candidates"
    assert len(list(gen2.glob("cand_*.json"))) == 4
    assert "Generation 2 saved" in outs[0]
