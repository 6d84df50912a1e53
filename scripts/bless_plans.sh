#!/bin/sh
# Re-bless the committed plan snapshots after an INTENDED plan change:
# copies the latest regenerated plans (from a Verify run or PlanAuditSpec)
# over plans/ so the audit baseline matches the new shape. Commit the
# refreshed snapshots together with the change that caused them.
set -e
cd "$(dirname "$0")/.."
src=target/plans
[ -d "$src" ] || src=target/plans-audit
[ -d "$src" ] || { echo "no regenerated plans under target/"; exit 1; }
mkdir -p plans
cp "$src"/*.txt plans/
echo "blessed $(ls "$src"/*.txt | wc -l) snapshots from $src"
