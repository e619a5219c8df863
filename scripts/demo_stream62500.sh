#!/bin/bash
# Round-5 VERDICT item 3: BASELINE config-5 "long trajectory with async host
# streaming" demonstrated at large N on TPU.
#
# Three legs (run sequentially — ONE TPU process at a time):
#   A. examples/n62500_large.json through `simulate --stream` (incremental
#      rva.dat via the C++ AsyncTrajectoryWriter + per-chunk checkpoints).
#   B. same run with --no-frames (isolates the trajectory-writer overhead —
#      the async writer must not stall the fused chunks).
#   C. kill-and-resume: leg A's config into a fresh dir, SIGKILLed mid-run,
#      restarted; the resumed run must bit-exactly reproduce leg A's series
#      (same chunk boundaries => identical scan structure).
#
# Usage: bash scripts/demo_stream62500.sh [outdir_root]
set -u
cd "$(dirname "$0")/.."
ROOT=${1:-/tmp/r5_stream_demo}
CFG=examples/n62500_large.json
mkdir -p "$ROOT"

echo "=== leg A: simulate --stream (full) ==="
TA0=$(date +%s)
timeout 3000 python -m ljmd_tpu simulate --config $CFG \
    --stream --out-dir "$ROOT/A" 2>&1 | grep -Ev "^WARNING|jax._src" | tail -30
echo "leg A wall: $(( $(date +%s) - TA0 )) s"
ls -l "$ROOT/A/rva.dat" || true

echo "=== leg B: simulate --stream --no-frames ==="
TB0=$(date +%s)
timeout 3000 python -m ljmd_tpu simulate --config $CFG \
    --stream --no-frames --out-dir "$ROOT/B" 2>&1 | grep -Ev "^WARNING|jax._src" | tail -5
echo "leg B wall: $(( $(date +%s) - TB0 )) s"

echo "=== leg C: kill mid-run, then resume ==="
# No timeout/pipe wrapper: $CPID must be the python process itself so the
# SIGKILL cannot orphan a live TPU client (one tunnel client at a time).
python -m ljmd_tpu simulate --config $CFG \
    --stream --out-dir "$ROOT/C" > "$ROOT/C_firstrun.log" 2>&1 &
CPID=$!
# Wait until at least one checkpoint chunk has landed, then kill hard.
for i in $(seq 1 500); do
  sleep 2
  if [ -f "$ROOT/C/production_checkpoint.npz" ]; then break; fi
  if ! kill -0 $CPID 2>/dev/null; then break; fi
done
sleep 10
echo "killing leg C (pid $CPID) with checkpoint present:"
ls -l "$ROOT/C" || true
kill -9 $CPID 2>/dev/null
wait $CPID 2>/dev/null
sleep 2
echo "--- resuming leg C ---"
timeout 3000 python -m ljmd_tpu simulate --config $CFG \
    --stream --out-dir "$ROOT/C" 2>&1 | grep -Ev "^WARNING|jax._src" | tail -5

echo "=== warm paired re-runs (compile-cache warm; back-to-back for the"
echo "=== streaming vs --no-frames overhead comparison) ==="
for leg in A2 B2; do
  EXTRA=""
  if [ "$leg" = "B2" ]; then EXTRA="--no-frames"; fi
  T0=$(date +%s)
  timeout 3000 python -m ljmd_tpu simulate --config $CFG \
      --stream $EXTRA --out-dir "$ROOT/$leg" 2>&1 | grep -Ev "^WARNING|jax._src" | tail -3
  echo "leg $leg wall: $(( $(date +%s) - T0 )) s"
done

echo "=== bit-exact check: leg C (killed+resumed) vs leg A ==="
python - "$ROOT" <<'EOF'
import sys, hashlib, numpy as np
root = sys.argv[1]
def md5(p):
    h = hashlib.md5()
    with open(p, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            h.update(chunk)
    return h.hexdigest()
a, c = md5(f"{root}/A/rva.dat"), md5(f"{root}/C/rva.dat")
print(f"rva.dat md5 A={a} C={c} match={a == c}")
sa = np.loadtxt(f"{root}/A/instantaneous_energies.dat", skiprows=1)
sc = np.loadtxt(f"{root}/C/instantaneous_energies.dat", skiprows=1)
print("series exact match:", np.array_equal(sa, sc))
for f in ("means.dat", "summary.json"):
    print(f, "md5 match:", md5(f"{root}/A/{f}") == md5(f"{root}/C/{f}"))
EOF
