#!/bin/bash
# Interleaved A/B of two class builds over a query subset (min-of-N JVMs,
# per-query min of ProbeConf's own min-of-2). Usage:
#   tools/ab.sh <classesA> <classesB> <queries> [sfDir] [rounds]
# Prints per-query min for each side. Alternating order cancels slow host
# drift; per-query min cancels JIT/GC noise between JVMs.
set -u
A="$1"; B="$2"; Q="$3"; SF="${4:-/root/testdata/sf0.1}"; N="${5:-3}"
for i in $(seq 1 "$N"); do
  GRAFT_CLASSES="$A" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    tools/run.sh graft.ProbeConf "$Q" "$SF" 2>/dev/null \
    | grep 'probe-conf' | sed "s/^/A /"
  GRAFT_CLASSES="$B" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    tools/run.sh graft.ProbeConf "$Q" "$SF" 2>/dev/null \
    | grep 'probe-conf' | sed "s/^/B /"
done | awk '
  $3 != "TOTAL" { k=$1" "$3; t=$4+0; if (!(k in m) || t<m[k]) m[k]=t }
  END { for (k in m) print k, m[k] }' | sort -k2,2 -k1,1
