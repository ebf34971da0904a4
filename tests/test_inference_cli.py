"""inference CLI end-to-end through a real subprocess (tiny generators)."""

import subprocess
import sys

ENV = {
    "JAX_PLATFORMS": "cpu",
    "PATH": "/usr/bin:/bin:/usr/local/bin",
    "HOME": "/root",
}


def _run(args, timeout=420):
    return subprocess.run(
        [sys.executable, "-m", "ecad_tpu.inference.cli", *args],
        capture_output=True, text=True, env=ENV, timeout=timeout,
        cwd="/root/repo",
    )


def test_prompt_to_image(tmp_path):
    r = _run(
        [
            "TinyPixArtImageGenerator",
            "--prompt", "a tiny test image",
            "--output-dir", str(tmp_path),
            "--num-inference-steps", "2",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert list((tmp_path / "embeddings").glob("*.pt"))
    pngs = list((tmp_path / "images").glob("*.png"))
    assert len(pngs) == 1 and "__image_seed:000" in pngs[0].name


def test_prompt_file_multiple_images(tmp_path):
    pf = tmp_path / "prompts.txt"
    pf.write_text("first prompt\nsecond prompt\n")
    r = _run(
        [
            "TinyPixArtImageGenerator",
            "--prompt-file", str(pf),
            "--output-dir", str(tmp_path / "out"),
            "--num-inference-steps", "2",
            "--images-per-prompt", "2",
            "--start-seed", "5",
            "--seed-step", "3",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    pngs = sorted((tmp_path / "out" / "images").glob("*.png"))
    assert len(pngs) == 4
    seeds = sorted({p.name.split("image_seed:")[1][:3] for p in pngs})
    assert seeds == ["005", "008"]  # start 5, step 3


def test_guidance_override_rejected():
    r = _run(
        [
            "TinyPixArtImageGenerator",
            "--prompt", "x",
            "--guidance-scale", "7.0",
        ]
    )
    assert r.returncode != 0
    assert "does not support --guidance-scale" in (r.stderr + r.stdout)


def test_mutually_exclusive_sources():
    r = _run(
        ["TinyPixArtImageGenerator", "--prompt", "a", "--prompt-file", "b"]
    )
    assert r.returncode != 0
    assert "not allowed with" in r.stderr


def test_flux_cache_dtype_flag(tmp_path):
    """--cache-dtype float8_e4m3fn rides the CLI into FluxConfig and the
    tiny FLUX pipeline still produces an image (f8 cache storage,
    docs/quantization.md)."""
    r = _run(
        [
            "TinyFluxImageGenerator",
            "--prompt", "a tiny f8-cache test",
            "--output-dir", str(tmp_path),
            "--num-inference-steps", "2",
            "--cache-dtype", "float8_e4m3fn",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(list((tmp_path / "images").glob("*.png"))) == 1


def test_pixart_cache_dtype_rejected(tmp_path):
    """PixArt generators reject --cache-dtype (FLUX-only option)."""
    r = _run(
        [
            "TinyPixArtImageGenerator",
            "--prompt", "x",
            "--output-dir", str(tmp_path),
            "--num-inference-steps", "2",
            "--cache-dtype", "float8_e4m3fn",
        ]
    )
    assert r.returncode != 0
    assert "cache_dtype" in (r.stderr + r.stdout)


def test_quant_int8_static_calibrates_and_generates(tmp_path):
    """--quant int8_static triggers the first-build calibration path
    (image_generators/pixart.py _calibrate_static_scales) and produces an
    image; the 1024² winner must be drivable from the CLI end-to-end."""
    r = _run(
        [
            "TinyPixArtImageGenerator",
            "--prompt", "a calibrated tiny image",
            "--output-dir", str(tmp_path),
            "--num-inference-steps", "2",
            "--quant", "int8_static",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(list((tmp_path / "images").glob("*.png"))) == 1
