#!/usr/bin/env bash
# Two-parallelism scaling measurement, one fresh JVM per level
# (shared-JVM runs bias whichever level goes second — see Scaling.scala).
# Usage: tools/scaling.sh [N] [CONVS]
set -euo pipefail
N="${1:-8}"
CONVS="${2:-160000}"
HI=$((N * 4))

run_level() {
  SPARK_GRAFT_SCALE_CORES="$1" SPARK_GRAFT_SCALE_CONVS="$CONVS" \
    sbt -batch "runMain graft.Scaling" 2>/dev/null \
    | grep -oE '\{"cores".*\}' | tail -1
}

LO_JSON=$(run_level "$N")
HI_JSON=$(run_level "$HI")
python3 - "$LO_JSON" "$HI_JSON" <<'EOF'
import json, sys
lo, hi = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (hi["cores"] / lo["cores"])
print(json.dumps({
    "metric": "scaling_efficiency", "value": round(eff, 3), "unit": "ratio",
    "cores_lo": lo["cores"], "cores_hi": hi["cores"], "turns": lo["turns"],
    "sec_lo": lo["sec"], "sec_hi": hi["sec"],
    "turns_per_sec_lo": lo["turns_per_sec"], "turns_per_sec_hi": hi["turns_per_sec"],
    "host_steal_pct_lo": lo.get("host_steal_pct"),
    "host_steal_pct_hi": hi.get("host_steal_pct")}))
EOF
