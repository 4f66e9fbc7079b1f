#!/bin/bash
# Interleaved A/B of two prof_ze-style binaries on one file+level.
# Host steal noise has multi-second period, so alternate the binaries
# per run and take per-binary minima: ./ab_bins.sh A B FILE LEVEL [ROUNDS]
A=$1; B=$2; F=$3; L=$4; N=${5:-7}
bestA=0; bestB=0
for i in $(seq $N); do
  a=$($A "$F" "$L" | head -1 | sed 's/.*: \([0-9.]*\) MB\/s.*/\1/')
  b=$($B "$F" "$L" | head -1 | sed 's/.*: \([0-9.]*\) MB\/s.*/\1/')
  bestA=$(echo "$bestA $a" | awk '{print ($2>$1)?$2:$1}')
  bestB=$(echo "$bestB $b" | awk '{print ($2>$1)?$2:$1}')
done
ra=$($A "$F" "$L" | head -1 | sed 's/.*ratio \([0-9.]*\)/\1/')
rb=$($B "$F" "$L" | head -1 | sed 's/.*ratio \([0-9.]*\)/\1/')
echo "$F L$L  A: $bestA MB/s r$ra | B: $bestB MB/s r$rb | B/A $(echo "$bestA $bestB" | awk '{printf "%.3f", $2/$1}')"
