#!/bin/bash
# Post-outage TPU measurement sequence. Run when the axon relay returns
# (watch /tmp/tpu_status.log). Logs everything under /tmp/tpu_session/.
#
#   1. verify skill recipes (scripts/verify_ssgp.py) — correctness first:
#      many commits landed CPU-validated during the relay outage.
#   2. experiments/time_steps.py    — config-5 cov+sqrt step timings
#      (session-2 bases: cov 551 ms / 181.5k steps/s, sqrt 913 ms).
#   3. experiments/profile_c5f.py   — stage attribution of the step.
#   4. bench.py                     — the driver metric line.
#   5. A/B PHYSS_FUSED_NARROW=256   — unmeasured knob from session 3.
set -u
OUT=/tmp/tpu_session
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/summary.log"
  timeout 3000 "$@" > "$OUT/$name.log" 2>&1
  echo "    rc=$? ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' '))" \
    | tee -a "$OUT/summary.log"
}
run verify   python .claude/skills/verify/verify_ssgp.py
run steps    python -u scripts/profile/time_steps.py
run profile  python -u scripts/profile/profile_c5f.py
run bench    python bench.py
run fusedAB  env PHYSS_FUSED_NARROW=256 python -u scripts/profile/time_steps.py
echo "DONE — read $OUT/summary.log" | tee -a "$OUT/summary.log"
