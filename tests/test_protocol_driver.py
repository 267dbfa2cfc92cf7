"""CI-tier smoke of the consolidated protocol fleet driver.

tools/run_protocol.sh replaces the ten run_protocol_r3{,b..i}/r4 scripts
with one table-driven driver; --dry-run parses a fleet table and prints
the planned invocations without touching the TPU or the run tree.
"""

import subprocess

REPO = "/root/repo"


def _dry_run(fleet: str) -> str:
    out = subprocess.run(
        ["bash", f"{REPO}/tools/run_protocol.sh", "--dry-run", fleet],
        capture_output=True, text=True, cwd=REPO)
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_dry_run_full_table():
    plan = _dry_run(f"{REPO}/tools/fleets/protocol_r3r4.tsv")
    lines = [l for l in plan.splitlines() if l.startswith("PLAN ")]
    assert len(lines) == 20  # every archived round-3/4 arm, once
    # Spot-check arm -> args wiring (label, seed, per-arm flags, commons).
    spirit = next(l for l in lines if l.startswith("PLAN spirit-fixedq-s1"))
    assert "seed=1" in spirit
    assert "--scene spirit" in spirit and "--fixed-q" in spirit
    assert "--fb-w-dtype bfloat16" in spirit
    assert "--corpus speech" in spirit and "--pool-size 2000" in spirit
    flagship = next(l for l in lines if l.startswith("PLAN flagship-s0"))
    assert "seed=0" in flagship and "--fixed-q" not in flagship


def test_dry_run_skips_comments_and_blanks(tmp_path):
    fleet = tmp_path / "fleet.tsv"
    fleet.write_text("# header\n\narm-a 3 slug-a --config c.yaml --x\n")
    plan = _dry_run(str(fleet))
    lines = [l for l in plan.splitlines() if l.startswith("PLAN ")]
    assert lines == [
        "PLAN arm-a: seed=3 comments=slug-a args: --config c.yaml --x "
        "--corpus speech --pool-size 2000 --noise-snr 5,25 "
        "--runs-root runs_protocol_r3"]
