#!/bin/sh
# Install the compile-guard pre-commit hook (run once per clone).
# r12 and r14 both shipped uncompiled snapshots while scripts/preflight.sh
# sat unused; the hook makes skipping it a deliberate --no-verify act.
set -e
cd "$(dirname "$0")/.."
cat > .git/hooks/pre-commit <<'HOOK'
#!/bin/sh
exec "$(git rev-parse --show-toplevel)/scripts/preflight.sh"
HOOK
chmod +x .git/hooks/pre-commit
echo "pre-commit compile guard installed"
