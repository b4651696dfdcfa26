#!/usr/bin/env bash
# Install the pre-commit smoke hook. Run once per clone: bash scripts/install_hooks.sh
set -eu
cd "$(dirname "$0")/.."
mkdir -p .git/hooks
cat > .git/hooks/pre-commit <<'HOOK'
#!/usr/bin/env bash
# Every-path engine smoke (~30 s). Bypass: SKIP_SMOKE=1 git commit ...
# (only for doc/comment-only commits — the round-14 postmortem rule).
if [ "${SKIP_SMOKE:-0}" = "1" ]; then
  echo "pre-commit: SKIP_SMOKE=1 — smoke bypassed" >&2
  exit 0
fi
# doc-only commits skip automatically
if git diff --cached --name-only | grep -qvE '\.(md|json|txt)$'; then
  exec python scripts/smoke.py
fi
echo "pre-commit: doc/data-only commit — smoke skipped" >&2
HOOK
chmod +x .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit"
