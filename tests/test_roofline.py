"""Roofline annotation integrity (VERDICT r3 item 4): no record may publish
a physically impossible utilization, and the workloads that beat an analytic
byte model must say so instead of quoting >100% of peak bandwidth."""

from benchmarks import roofline


def test_annotate_basic_fields():
    rec = roofline.annotate({}, flops_per_step=1e9, bytes_per_step=1e6,
                            steps_per_s=10.0, platform="tpu")
    assert rec["achieved_tflops"] == 0.01
    assert 0 < rec["mfu"] < 1 and 0 < rec["hbm_util"] < 1
    assert rec["bound"] == "overhead"
    assert "bound_model" not in rec


def test_annotate_clamps_impossible_hbm_util():
    """The round-3 artifact: matrix_fact_dense published hbm_util 1.33.
    Any >1 value must be clamped to 1.0, kept raw, and flagged."""
    # bytes/step chosen so raw hbm_util ~ 1.33 at the given rate
    bytes_per_step = 1.33 * roofline.PEAK_HBM_GBS * 1e9
    rec = roofline.annotate({}, flops_per_step=1e12,
                            bytes_per_step=bytes_per_step,
                            steps_per_s=1.0, platform="tpu")
    assert rec["hbm_util"] == 1.0
    assert abs(rec["hbm_util_raw"] - 1.33) < 0.01
    assert rec["bound_model"] == "exceeded-by-fusion"
    assert rec["bound"] == "bandwidth"


def test_annotate_clamps_impossible_mfu():
    rec = roofline.annotate({}, flops_per_step=2 * roofline.PEAK_F32_TFLOPS
                            * 1e12, bytes_per_step=1.0,
                            steps_per_s=1.0, platform="tpu")
    assert rec["mfu"] == 1.0 and rec["mfu_raw"] > 1.9
    assert rec["bound_model"] == "exceeded-by-fusion"


def test_annotate_bound_override():
    rec = roofline.annotate({}, *roofline.linreg_fused_step(),
                            steps_per_s=1.9e6, platform="tpu",
                            bound_override="serial-latency")
    assert rec["bound"] == "serial-latency"
    assert rec["mfu"] is not None and rec["mfu"] < 1


def test_dense_mf_byte_model_is_physical_at_measured_rate():
    """At the round-3 measured 7,445 steps/s on the 3000x1500x16 config the
    perfect-fusion floor model must put hbm_util strictly below 1."""
    f, b = roofline.matrix_fact_dense(3000, 1500, 16)
    rec = roofline.annotate({}, f, b, steps_per_s=7445.0, platform="tpu")
    assert rec["hbm_util"] < 1.0 and "bound_model" not in rec
