"""check_autotune log parsing: config-arm attribution by position."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))

import check_autotune as ca  # noqa: E402


def test_parse_log_attributes_config_arms(tmp_path):
    # bench.py emits the 4 configs in order within one (matrix, alpha, K)
    # group; the subpack arm is positional (not in the line itself)
    log = tmp_path / "bench.log"
    log.write_text(
        "# m1 a=0.1 d=0.002 k=128: 100 GFLOPS (1 ms, dense 1, gath 0, "
        "res 0, fill 0.1)\n"
        "# m1 a=0.1 d=0.006 k=128: 110 GFLOPS (1 ms, dense 1, gath 0, "
        "res 0, fill 0.1)\n"
        "# m1 a=0.1 d=0.002 k=128: 120 GFLOPS (1 ms, dense 1, gath 0, "
        "res 0, fill 0.1)\n"
        "# m1 a=0.1 d=0.02 k=128: 90 GFLOPS (1 ms, dense 1, gath 0, "
        "res 0, fill 0.1)\n"
        "# m1 a=0.3 d=0.002 k=128: 95 GFLOPS (1 ms, dense 1, gath 0, "
        "res 0, fill 0.1)\n"
        # fp16-emission arm lines carry a ` dt=f16` tag between `k=` and
        # `:` precisely so this parser skips them (a match would corrupt
        # the positional counter)
        "# m1 a=0.3 d=0.002 k=128 dt=f16: 130 GFLOPS (1 ms, dense 1, "
        "gath 0, res 0, fill 0.1)\n")
    runs = ca.parse_log(str(log))
    g = runs[("m1", 128)]
    # same delta 0.002 appears with sub=0 (1st) and sub=12 (3rd)
    assert g[(0.1, 0.002, 0)] == 100.0
    assert g[(0.1, 0.006, 0)] == 110.0
    assert g[(0.1, 0.002, 12)] == 120.0
    assert g[(0.1, 0.02, 12)] == 90.0
    # a new alpha restarts the positional counter
    assert g[(0.3, 0.002, 0)] == 95.0
