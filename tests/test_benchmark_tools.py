"""End-to-end benchmark-tier flow on the tiny generator:
embeddings → images → scores → macs → latency, exercising the real CLIs."""

import json
from pathlib import Path

import numpy as np
import pytest

from ecad_tpu.benchmark import (
    compute_latency,
    compute_macs,
    generate_embeddings,
    generate_images,
    score_images,
)
from ecad_tpu.benchmark.prompts import read_benchmark_prompts
from ecad_tpu.schedules.generators import pixart_cache, save_schedules


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("benchflow")
    prompt_file = ws / "prompts.json"
    prompt_file.write_text(
        json.dumps(
            [
                {"id": "p1", "prompt": "a cat on a mat"},
                {"id": "p2", "prompt": "the Eiffel tower at night"},
            ]
        )
    )
    return ws


def test_prompt_readers(workspace, tmp_path):
    named = read_benchmark_prompts(workspace / "prompts.json")
    assert "000__prompt_id:p1__prompt_seed:000" in named
    txt = tmp_path / "p.txt"
    txt.write_text("one\ntwo\n")
    named_txt = read_benchmark_prompts(txt)
    assert list(named_txt) == ["000__prompt_seed:000", "001__prompt_seed:000"]
    tsv = tmp_path / "p.tsv"
    tsv.write_text("Prompt\tCategory\nhello\tc\n")
    assert list(read_benchmark_prompts(tsv)) == ["0000__prompt_seed:000"]


def test_full_benchmark_flow(workspace):
    emb_dir = workspace / "embeddings"
    img_dir = workspace / "images"
    sched_dir = workspace / "schedules"

    # 1. embeddings
    generate_embeddings.main(
        [
            "TinyPixArtImageGenerator",
            "--prompt-file", str(workspace / "prompts.json"),
            "--output-dir", str(emb_dir),
            "--random-weights",
        ]
    )
    pts = sorted(emb_dir.glob("*.pt"))
    assert len(pts) == 2
    assert pts[0].name.startswith("000__prompt_id:p1__")

    # 2. schedules (tiny: 2 blocks, 4 steps)
    save_schedules(
        (
            s
            for s in pixart_cache.gen_recompute_all_every_n(2, 4)
            if s.name == "recompute_all_every_002"
        ),
        sched_dir,
        verbose=False,
    )
    save_schedules(pixart_cache.gen_default(2, 4), sched_dir, verbose=False)

    # 3. images over the schedule dir
    generate_images.main(
        [
            "TinyPixArtImageGenerator",
            "--input-embeddings", str(emb_dir),
            "--output-dir", str(img_dir),
            "--schedule-dir", str(sched_dir),
            "--images-per-prompt", "2",
        ]
    )
    default_pngs = sorted((img_dir / "default").glob("*.png"))
    assert len(default_pngs) == 4
    assert "__image_seed:" in default_pngs[0].name
    # cached schedule produces different images than default
    a = (img_dir / "default" / default_pngs[0].name).read_bytes()
    b = (img_dir / "recompute_all_every_002" / default_pngs[0].name).read_bytes()
    assert a != b

    # skip logic: rerun produces no new work
    generate_images.main(
        [
            "TinyPixArtImageGenerator",
            "--input-embeddings", str(emb_dir),
            "--output-dir", str(img_dir),
            "--schedule-dir", str(sched_dir),
            "--images-per-prompt", "2",
        ]
    )

    # 4. scoring
    score_images.main(
        [
            "--image-dir", str(img_dir),
            "--prompt-file", str(workspace / "prompts.json"),
            "--exactly-n-images", "4",
        ]
    )
    scores = json.loads((img_dir / "default" / "scores.json").read_text())
    assert set(scores) == {"total_score", "avg_by_prompt", "score_by_prompt_id"}
    assert set(scores["avg_by_prompt"]) == {"p1", "p2"}

    # 5. macs into schedule JSONs
    compute_macs.main(["--input-dir", str(sched_dir)])
    data = json.loads((sched_dir / "default.json").read_text())
    assert data["metrics"]["total_macs_T"] > 0

    # 6. latency protocol
    compute_latency.main(
        [
            "TinyPixArtImageGenerator",
            "--input-embeddings", str(emb_dir),
            "--schedule", str(sched_dir / "default.json"),
            "--warmup-steps", "1",
            "--num-samples", "2",
            "--batch-size", "2",
            "--random-weights",
        ]
    )
    data = json.loads((sched_dir / "default.json").read_text())
    lat = data["metrics"]["latency"]
    assert lat["avg"] > 0 and len(lat["latencies"]) == 2

    # 6b. --random-vae: the timed region includes a real (random-weight)
    # VAE decode, matching the reference's timed __call__
    compute_latency.main(
        [
            "TinyPixArtImageGenerator",
            "--input-embeddings", str(emb_dir),
            "--schedule", str(sched_dir / "default.json"),
            "--warmup-steps", "1",
            "--num-samples", "1",
            "--batch-size", "2",
            "--random-weights",
            "--random-vae",
        ]
    )
    lat_vae = json.loads(
        (sched_dir / "default.json").read_text()
    )["metrics"]["latency"]
    assert lat_vae["avg"] > 0


def test_embeddings_modes(workspace, tmp_path):
    coco = tmp_path / "coco.txt"
    coco.write_text("\n".join(f"caption {i}" for i in range(7)))
    generate_embeddings.main(
        [
            "TinyPixArtImageGenerator",
            "--prompt-file", str(coco),
            "--output-dir", str(tmp_path / "coco_emb"),
            "--mode", "coco",
            "--megabatch-size", "3",
            "--random-weights",
        ]
    )
    assert len(list((tmp_path / "coco_emb" / "megabatch_0").glob("*.pt"))) == 3
    assert len(list((tmp_path / "coco_emb" / "megabatch_2").glob("*.pt"))) == 1

    mjhq = tmp_path / "mjhq.json"
    mjhq.write_text(
        json.dumps(
            {
                "img1": {"prompt": "a", "category": "animals"},
                "img2": {"prompt": "b", "category": "food"},
                "img3": {"prompt": "c", "category": "animals"},
            }
        )
    )
    generate_embeddings.main(
        [
            "TinyPixArtImageGenerator",
            "--prompt-file", str(mjhq),
            "--output-dir", str(tmp_path / "mjhq_emb"),
            "--mode", "mjhq",
            "--random-weights",
        ]
    )
    assert len(list((tmp_path / "mjhq_emb" / "animals").glob("*.pt"))) == 2
    assert len(list((tmp_path / "mjhq_emb" / "food").glob("*.pt"))) == 1


def test_generate_and_score_shard_by_process(tmp_path, monkeypatch):
    """generate_images --schedule-dir and score_images each process only
    this host's strided shard (multi-host work partitioning)."""
    from ecad_tpu.benchmark import generate_embeddings, generate_images
    from ecad_tpu.benchmark import score_images as score_mod
    from ecad_tpu.schedules.generators import save_schedules
    from ecad_tpu.schedules.generators.pixart_cache import (
        gen_recompute_all_every_n,
    )
    import ecad_tpu.parallel.distributed as dist

    pf = tmp_path / "p.txt"
    pf.write_text("one prompt\n")
    generate_embeddings.main(
        ["TinyPixArtImageGenerator", "--prompt-file", str(pf),
         "--output-dir", str(tmp_path / "emb"), "--random-weights"]
    )
    scheds = [s for s in gen_recompute_all_every_n(2, 3)][:2]
    save_schedules(scheds, tmp_path / "scheds", verbose=False)

    # simulate process 1 of 2: only the second schedule renders
    monkeypatch.setattr(dist.jax, "process_count", lambda: 2)
    monkeypatch.setattr(dist.jax, "process_index", lambda: 1)
    generate_images.main(
        ["TinyPixArtImageGenerator",
         "--input-embeddings", str(tmp_path / "emb"),
         "--output-dir", str(tmp_path / "imgs"),
         "--schedule-dir", str(tmp_path / "scheds")]
    )
    dirs = sorted(d.name for d in (tmp_path / "imgs").iterdir())
    assert dirs == ["recompute_all_every_003"]

    # process 0 of 2 renders the other one
    monkeypatch.setattr(dist.jax, "process_index", lambda: 0)
    generate_images.main(
        ["TinyPixArtImageGenerator",
         "--input-embeddings", str(tmp_path / "emb"),
         "--output-dir", str(tmp_path / "imgs"),
         "--schedule-dir", str(tmp_path / "scheds")]
    )
    dirs = sorted(d.name for d in (tmp_path / "imgs").iterdir())
    assert dirs == ["recompute_all_every_002", "recompute_all_every_003"]

    # scoring shards by leaf dir the same way
    score_mod.main(
        ["--image-dir", str(tmp_path / "imgs"), "--scorer", "mock",
         "--naming", "parti", "--prompt-file", str(pf)]
    )
    scored = sorted(p.parent.name for p in (tmp_path / "imgs").rglob("scores.json"))
    assert scored == ["recompute_all_every_002"]


def test_score_images_naming_mismatch_is_not_a_crash(tmp_path, capsys):
    """All-files-unparseable must skip with a --naming hint, not crash on
    np.stack([]) (found by driving the CLI with the wrong naming mode)."""
    import numpy as np
    from PIL import Image

    from ecad_tpu.benchmark import score_images as score_mod

    d = tmp_path / "imgs" / "sched"
    d.mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        d / "0000__prompt_seed:000__image_seed:000.png"
    )
    score_mod.main(
        ["--image-dir", str(tmp_path / "imgs"), "--scorer", "mock"]
    )
    out = capsys.readouterr().out
    assert "check --naming" in out and "Scored 0 directories" in out
    assert not (d / "scores.json").exists()
