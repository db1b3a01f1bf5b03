"""Bench artifact contract: the driver keeps only the LAST 2000 chars
of bench.py stdout, so the headline line (printed last) must ALWAYS fit
inside that window — round 4 lost the primary metric when the detail
line grew past it (VERDICT r4, missing #1). These tests pin the
contract without running the full bench."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def _representative_payload():
    """Mirrors the headline keys main() emits, with realistic widths."""
    q = {"elbo_heldout": -7.9935, "angle_corr": 0.9011}
    probe = {"rtt_ms": {"n": 10, "median": 35.812, "spread": 0.4312},
             "d2h_MBps": 18.123, "h2d_MBps": 52.447,
             "probe_bytes": 16777216}
    return {
        "metric": "segmentor_512eq_images_per_sec_train_predict",
        "value": 152.934, "unit": "images/s", "vs_baseline": 894.12,
        "train_s": 14.1312, "predict_s": 1.6712, "predict_s_u8": 0.7034,
        "rvae_steps_per_sec": 980.12, "rvae_vs_baseline": 1952.4,
        "iou_ours": 0.9745, "iou_ref": 0.9381,
        "rvae_quality_ours": q, "rvae_quality_ref": q,
        "imspec_vs": 491.3, "ensemble_vs": 365.1, "dklgpr_vs": 470.2,
        "jvae_sps": 851.52, "jrvae_sps": 1158.43, "denoiser_cps": 381.44,
        "locator_64x512_s": 2.7012,
        "dtype": {"backend": "tpu", "compute": "bfloat16",
                  "param": "float32"},
        "tunnel_probe": probe, "tunnel_probe_end": probe,
    }


def test_representative_headline_fits_untrimmed():
    s = bench.render_headline(_representative_payload())
    assert len(s) <= bench.HEADLINE_BUDGET
    out = json.loads(s)
    assert "trimmed" not in out
    assert out["value"] == 152.934 and out["unit"] == "images/s"


def test_budget_leaves_newline_margin_inside_driver_window():
    # the driver window is 2000 chars of raw stdout INCLUDING the
    # headline's trailing newline
    assert bench.HEADLINE_BUDGET <= 1999


def test_overflow_trims_but_keeps_primary_metric():
    p = _representative_payload()
    # a failed quality gate can inject long error strings
    p["rvae_quality_ours"] = {"error": "x" * 3000}
    s = bench.render_headline(p)
    assert len(s) <= bench.HEADLINE_BUDGET
    out = json.loads(s)
    assert out["metric"] == p["metric"]
    assert out["value"] == p["value"]
    assert out["vs_baseline"] == p["vs_baseline"]
    assert "rvae_quality_ours" not in out
    assert "rvae_quality_ours" in out["trimmed"]


def test_degenerate_overflow_still_emits_core_keys():
    p = _representative_payload()
    p["metric"] = "m"  # keep core small so the fallback itself fits
    for k in list(p):
        if k not in ("metric", "value", "unit", "vs_baseline",
                     "train_s", "predict_s"):
            p[k] = "y" * 200
    s = bench.render_headline(p, budget=400)
    assert len(s) <= 400
    out = json.loads(s)
    assert out["value"] == p["value"]
    assert out["trimmed"] == "all_optional"


@pytest.mark.parametrize("key", ["value", "train_s", "predict_s",
                                 "rvae_steps_per_sec", "iou_ours",
                                 "dtype", "tunnel_probe"])
def test_headline_carries_every_verdict_required_key(key):
    # VERDICT r4 #1 names the keys the artifact must retain
    src_tail = open(os.path.join(os.path.dirname(__file__), "..",
                                 "bench.py")).read()
    assert f'"{key}"' in src_tail.split("render_headline({", 1)[1]
