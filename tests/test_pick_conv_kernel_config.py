"""The stage-3 A/B automation (scripts/run_ab_queue3.sh) trusts
scripts/pick_conv_kernel_config.py to parse bench_conv_int8.py's output and
emit the winning env config; a silent parse mismatch would make the queue
skip the end-to-end conv-kernel A/B. Pin the contract here, including the
exact line format bench_conv_int8.py prints (tag: xla %7.2fms %6.1f TOPS |
pallas %7.2fms %6.1f TOPS | speedup %.2fx).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PICKER = os.path.join(REPO, "scripts", "pick_conv_kernel_config.py")


def _run(tmp_path, text):
    f = tmp_path / "sweep.txt"
    f.write_text(text)
    return subprocess.run(
        [sys.executable, PICKER, str(f)], capture_output=True, text=True
    )


def _line(tag, xla_ms, pl_ms):
    # mirrors scripts/bench_conv_int8.py:92-98 formatting exactly
    flops = 1e12
    return (
        f"{tag}: xla {xla_ms:7.2f}ms {flops / (xla_ms / 1e3) / 1e12:6.1f} TOPS | "
        f"pallas {pl_ms:7.2f}ms {flops / (pl_ms / 1e3) / 1e12:6.1f} TOPS | "
        f"speedup {xla_ms / pl_ms:.2f}x"
    )


def test_picks_config_with_largest_total_saving(tmp_path):
    text = "\n".join([
        "=== stage3 start ===",
        "--- conv kernel tile_m=256 tile_n=256",
        _line("unet_l0_64px_c320", 12.34, 10.00),   # saves 2.34
        _line("unet_l1_32px_c640", 6.00, 7.00),     # loses
        "--- conv kernel tile_m=512 tile_n=256",
        _line("unet_l0_64px_c320", 12.34, 8.00),    # saves 4.34
        _line("unet_l3_8px_c1280", 2.00, 1.90),     # saves 0.10 (>1.02x)
        "",
    ])
    r = _run(tmp_path, text)
    assert r.returncode == 0, r.stderr
    cfg = dict(l.split("=", 1) for l in r.stdout.strip().splitlines())
    assert cfg["IRET_CONV_KERNEL"] == "1"
    assert cfg["IRET_CONV_TILE_M"] == "512"
    assert cfg["IRET_CONV_TILE_N"] == "256"
    # HW gate lists only the winning heights, descending
    assert cfg["IRET_CONV_KERNEL_HW"] == "64,8"


def test_sub_threshold_speedups_do_not_count(tmp_path):
    # 1.01x is inside relay noise — must not trigger a config
    text = "\n".join([
        "--- conv kernel tile_m=256 tile_n=256",
        _line("unet_l0_64px_c320", 10.10, 10.00),
        "",
    ])
    r = _run(tmp_path, text)
    assert r.returncode == 1
    assert r.stdout.strip() == ""


def test_no_win_exits_nonzero(tmp_path):
    text = "\n".join([
        "--- conv kernel tile_m=256 tile_n=256",
        _line("unet_l0_64px_c320", 8.00, 10.00),
        "unet_l1_32px_c640: xla    6.00ms  200.0 TOPS | ",  # pallas FAILED row
        "",
    ])
    r = _run(tmp_path, text)
    assert r.returncode == 1
