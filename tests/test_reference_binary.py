"""Parity against the ACTUAL reference binary, compiled from its own source.

Every other parity test in this suite checks the TPU solver against the NumPy
oracle — i.e. against *our reading* of /root/reference/fpmMain.cpp. This module
closes the loop against the artifact itself: it compiles the verbatim reference
source (fpmMain.cpp + its vendored JsonCpp) against the reconstructed cvComplex
shim (native/refshim/, see cvComplex.h for provenance), runs the binary on a
`simulate`-generated uint16-TIFF dataset, extracts its final object and pupil
through the shim's dump hook, and compares numerically.

The dataset uses `--jitter` so illumination NAs are strictly distinct: the
reference sorts its schedule with an unstable std::sort (fpmMain.h:111), so on
exact NA ties its processing order is an STL implementation detail that no
reimplementation can (or should) reproduce. With ties broken, the schedule is
unique and the trajectories must agree to float64 rounding.

Also pins, via native/refshim/cv_probe.cpp, the OpenCV semantics the solver
contract depends on: cv::add(mat, double) scalar-unrolls across BOTH channels
(the eps term, fpmMain.cpp:390), cv::divide's half-to-even rounding
(fpmMain.cpp:129), saturating cv::subtract (fpmMain.cpp:143), and the filled
cv::circle rasterization (fpmMain.cpp:307) being exactly the analytic disk.

Skips cleanly when g++/OpenCV4 are unavailable (the shim toolchain is a
test-only dependency; the framework itself never needs OpenCV).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess

import numpy as np
import pytest

from fpm_tpu.cli import main as cli_main
from fpm_tpu.config import load_config
from fpm_tpu.data.loader import load_dataset
from fpm_tpu.geometry import pupil_radius
from fpm_tpu.oracle import run_fpm_oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_DIR = os.environ.get("FPM_REFERENCE_DIR", "/root/reference")
BUILD_SCRIPT = os.path.join(REPO, "scripts", "build_reference.sh")
BIN_DIR = os.path.join(REPO, "build", "refbin")


def _toolchain_available() -> bool:
    if shutil.which("g++") is None or shutil.which("pkg-config") is None:
        return False
    if not os.path.isfile(os.path.join(REFERENCE_DIR, "fpmMain.cpp")):
        return False
    return (
        subprocess.run(
            ["pkg-config", "--exists", "opencv4"], capture_output=True
        ).returncode
        == 0
    )


@pytest.fixture(scope="session")
def ref_binaries():
    """Build (or reuse) the reference binary + probe; skip without toolchain."""
    if not _toolchain_available():
        pytest.skip("g++/opencv4/reference source not available")
    fpm_main = os.path.join(BIN_DIR, "fpmMain")
    probe = os.path.join(BIN_DIR, "cv_probe")
    sources = [
        os.path.join(REFERENCE_DIR, "fpmMain.cpp"),
        os.path.join(REPO, "native", "refshim", "cvComplex.h"),
        os.path.join(REPO, "native", "refshim", "cvComplex.cpp"),
        os.path.join(REPO, "native", "refshim", "cv_probe.cpp"),
        BUILD_SCRIPT,
    ]
    newest_src = max(os.path.getmtime(p) for p in sources)
    if not all(
        os.path.isfile(b) and os.path.getmtime(b) > newest_src
        for b in (fpm_main, probe)
    ):
        proc = subprocess.run(
            ["bash", BUILD_SCRIPT], capture_output=True, text=True, timeout=600
        )
        if proc.returncode != 0:
            pytest.skip(f"reference build failed:\n{proc.stderr[-2000:]}")
    return fpm_main, probe


@pytest.fixture(scope="session")
def ref_dataset(tmp_path_factory):
    """A jittered (tie-free), float32-exact synthetic dataset on disk."""
    out = tmp_path_factory.mktemp("refds")
    rc = cli_main(
        ["simulate", str(out), "--np-size", "16", "--grid", "5", "--jitter", "0.15"]
    )
    assert rc == 0
    cfg = load_config(str(out / "dataset.json"), iterations=3)
    ds = load_dataset(cfg)
    # Preconditions for a unique, reimplementation-independent schedule:
    na32 = np.sort(ds.geom.illumination_na.astype(np.float32))
    assert np.diff(na32).min() > 1e-5, "NA ties survived jitter; reseed"
    return out, cfg, ds


def _read_dump(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        hdr = np.fromfile(f, np.int32, 5)
        assert hdr[0] == 0x46504D31, f"bad dump magic in {path}"
        rows, cols, ch, _mode = (int(x) for x in hdr[1:])
        data = np.fromfile(f, np.float64, rows * cols * ch).reshape(rows, cols, ch)
    return data[..., 0] + 1j * data[..., 1] if ch == 2 else data[..., 0]


def _rel_rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(
        np.sqrt(np.mean(np.abs(a - b) ** 2)) / np.sqrt(np.mean(np.abs(b) ** 2))
    )


def _run_reference(binary, dataset_json, iterations, dump_dir=None, timeout=300):
    env = dict(os.environ)
    env.pop("FPM_REF_DUMP", None)
    if dump_dir is not None:
        os.makedirs(dump_dir, exist_ok=True)
        env["FPM_REF_DUMP"] = str(dump_dir)
    return subprocess.run(
        [binary, str(dataset_json), str(iterations)],
        capture_output=True,
        text=True,
        env=env,
        timeout=timeout,
    )


def test_oracle_matches_reference_binary(ref_binaries, ref_dataset, tmp_path):
    """Final object+pupil of the compiled reference ≡ oracle to f64 rounding.

    This is the check that could falsify the whole parity tower: the oracle
    is our reading of fpmMain.cpp:274-498; the binary is fpmMain.cpp itself.
    Measured on this rig: ~4e-16 relative RMSE (see PARITY.md §reference-binary).
    """
    fpm_main, _ = ref_binaries
    out, cfg, ds = ref_dataset
    dump = tmp_path / "dump"
    proc = _run_reference(fpm_main, out / "dataset.json", 3, dump_dir=dump)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    ref_obj = _read_dump(str(dump / "000_Object.bin"))
    ref_pupil = _read_dump(str(dump / "001_Pupil.bin"))

    res = run_fpm_oracle(ds.images, ds.geom, cfg, iterations=3)
    obj_err = _rel_rmse(res.obj_crop, ref_obj)
    pupil_err = _rel_rmse(np.fft.fftshift(res.pupil), ref_pupil)
    print(f"reference-binary parity: obj {obj_err:.3e}, pupil {pupil_err:.3e}")
    assert obj_err < 1e-12
    assert pupil_err < 1e-12


def test_solver_matches_reference_binary(ref_binaries, ref_dataset, tmp_path):
    """The jitted float64 TPU solver against the compiled reference itself."""
    from fpm_tpu.models.epry import reconstruct

    fpm_main, _ = ref_binaries
    out, cfg, ds = ref_dataset
    dump = tmp_path / "dump"
    proc = _run_reference(fpm_main, out / "dataset.json", 3, dump_dir=dump)
    assert proc.returncode == 0
    ref_obj = _read_dump(str(dump / "000_Object.bin"))
    ref_pupil = _read_dump(str(dump / "001_Pupil.bin"))

    res = reconstruct(ds.images, ds.geom, cfg, iterations=3, dtype="complex128")
    obj_err = _rel_rmse(np.asarray(res.obj_crop), ref_obj)
    pupil_err = _rel_rmse(np.fft.fftshift(np.asarray(res.pupil)), ref_pupil)
    print(f"solver-vs-binary parity: obj {obj_err:.3e}, pupil {pupil_err:.3e}")
    assert obj_err < 1e-10
    assert pupil_err < 1e-10


def test_schedule_matches_reference_binary(ref_binaries, ref_dataset, tmp_path):
    """Processing order (ascending-NA schedule) ≡ the binary's, tie-free."""
    fpm_main, _ = ref_binaries
    out, cfg, ds = ref_dataset
    doc = json.load(open(out / "dataset.json"))
    doc["debug"] = True
    dbg_json = tmp_path / "dataset_dbg.json"
    json.dump(doc, open(dbg_json, "w"))
    proc = _run_reference(fpm_main, dbg_json, 1)
    assert proc.returncode == 0
    ref_order = [int(m) for m in re.findall(r"Starting LED# (\d+)", proc.stdout)]
    assert ref_order == list(ds.geom.sorted_led_numbers())


def test_darkfield_divide_matches_reference_binary(ref_binaries, tmp_path):
    """darkfieldExpMultiplier ingestion (cvRound half-to-even divide,
    fpmMain.cpp:128-129) proven end-to-end against the binary."""
    fpm_main, _ = ref_binaries
    out = tmp_path / "ds"
    rc = cli_main(
        ["simulate", str(out), "--np-size", "16", "--grid", "5",
         "--jitter", "0.15", "--darkfield-exp", "3"]
    )
    assert rc == 0
    cfg = load_config(str(out / "dataset.json"), iterations=2)
    ds = load_dataset(cfg)
    dump = tmp_path / "dump"
    proc = _run_reference(fpm_main, out / "dataset.json", 2, dump_dir=dump)
    assert proc.returncode == 0
    ref_obj = _read_dump(str(dump / "000_Object.bin"))
    res = run_fpm_oracle(ds.images, ds.geom, cfg, iterations=2)
    err = _rel_rmse(res.obj_crop, ref_obj)
    print(f"darkfield parity: obj {err:.3e}")
    assert err < 1e-12


def test_cv_semantics_probe(ref_binaries, tmp_path):
    """Pin the OpenCV behaviors the solver contract encodes.

    - cv::add(mat2ch, double) unrolls the scalar to BOTH channels → the eps
      term in amplitude replacement is eps*(1+1j) (oracle.py, epry.py).
    - cv::divide(u16, double) rounds half-to-even (loader.py darkfield path).
    - cv::subtract(u16, Scalar) saturates at 0 (loader.py bg subtraction).
    """
    _, probe = ref_binaries
    from PIL import Image

    tif = tmp_path / "probe16.tif"
    arr = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 500 + 12345).astype(
        np.uint16
    )
    Image.fromarray(arr).save(tif)
    proc = subprocess.run(
        [probe, str(tif)], capture_output=True, text=True, timeout=60
    )
    assert proc.returncode == 0, proc.stderr
    d = json.loads(proc.stdout)
    assert d["add_scalar_2ch"] == [0.25, 0.25]
    assert d["add_scalar_2ch_umat"] == [0.25, 0.25]
    assert d["mul_scalar_2ch"] == [6.0, 10.0]
    # -1*CV_LOAD_IMAGE_ANYDEPTH == -2 loads 16-bit TIFF as CV_16UC1 unchanged
    assert d["imread_neg2"]["ok"] and d["imread_neg2"]["type"] == 2
    assert d["imread_neg2"]["px00"] == 12345
    assert d["div_u16_half"] == [0, 2, 2, 4]  # 1/2→0, 3/2→2, 5/2→2, 7/2→4
    assert d["sub_u16_sat"] == [0, 50]


def test_circle_rasterization_is_analytic_disk(ref_binaries, tmp_path):
    """cv::circle(filled, 8-connected) ≡ the analytic disk dist² ≤ r².

    geometry.pupil_support uses the analytic disk; this proves that is not a
    divergence from the reference's rasterized pupil for every radius r=1..45
    (the bundled configs produce pupil radii 26..37; the hermetic test
    config produces 5).
    """
    _, probe = ref_binaries
    proc = subprocess.run([probe], capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0
    out = json.loads(proc.stdout)
    # bitmap check for small radii
    masks = out["circle_masks"]
    yy, xx = np.mgrid[0:33, 0:33]
    for r in range(1, 16):
        cv_mask = np.array(
            [[(row >> j) & 1 for j in range(33)] for row in masks[str(r)]], bool
        )
        disk = (xx - 16) ** 2 + (yy - 16) ** 2 <= r * r
        assert np.array_equal(cv_mask, disk), f"radius {r} differs"
    # diff-count check up to r=45 (computed against the disk inside the probe)
    assert out["circle_vs_disk_diffs"] == [0] * 45


def test_rotation_and_flip_quirk_match_reference_binary(ref_binaries,
                                                        ref_dataset, tmp_path):
    """Geometry transforms proven against the binary: arrayRotation and the
    flip-overwrite quirk (fpmMain.cpp:88-93 — flipDatasetY OVERWRITES
    flipDatasetX rather than composing). The frames were simulated without
    these transforms, so reconstruction quality is meaningless — but parity
    is input-for-input: oracle and binary consume the same JSON+TIFFs and
    must produce the same field to float64 rounding."""
    fpm_main, _ = ref_binaries
    out, _cfg, _ds = ref_dataset
    for name, extra in (
        ("rot", {"arrayRotation": 30}),
        # both flips on: the reference's Y-flip matrix OVERWRITES the
        # X-flip matrix — the strict_reference_flips quirk path
        ("flips", {"flipDatasetX": True, "flipDatasetY": True}),
    ):
        doc = json.load(open(out / "dataset.json"))
        doc.update(extra)
        cfg_path = tmp_path / f"dataset_{name}.json"
        json.dump(doc, open(cfg_path, "w"))

        cfg = load_config(str(cfg_path), iterations=2)
        ds = load_dataset(cfg)
        # transformed NAs must stay clear of the filter cutoff (float32
        # compare on both sides) and of schedule ties
        na32 = np.sort(ds.geom.illumination_na.astype(np.float32))
        assert np.diff(na32).min() > 1e-5, f"{name}: NA ties"
        assert np.abs(
            ds.geom.illumination_na.astype(np.float32)
            - np.float32(cfg.max_illumination_na)
        ).min() > 1e-4, f"{name}: NA at the filter boundary"

        dump = tmp_path / f"dump_{name}"
        proc = _run_reference(fpm_main, cfg_path, 2, dump_dir=dump)
        assert proc.returncode == 0, proc.stderr[-1500:]
        ref_obj = _read_dump(str(dump / "000_Object.bin"))
        res = run_fpm_oracle(ds.images, ds.geom, cfg, iterations=2)
        err = _rel_rmse(res.obj_crop, ref_obj)
        print(f"{name} parity: obj {err:.3e}")
        assert err < 1e-12, f"{name}: oracle/binary diverged ({err:.3e})"
