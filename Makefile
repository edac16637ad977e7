# Round rituals. ROUND selects the artifact suffix (e.g. make ROUND=05
# correctness-local).
ROUND ?= 05
SF_DIR ?= /root/testdata/sf0.01

.PHONY: test correctness-local bench

test:
	python -m pytest tests/ -x -q

# The HEAD ritual (VERDICT r4 #4): regenerate the full-registry local
# oracle artifact as the round's FINAL commit, so its green claim is
# pinned to the round HEAD instead of going stale mid-round.
correctness-local:
	python tools/check_oracle.py --json CORRECTNESS_LOCAL_r$(ROUND).json $(SF_DIR)

bench:
	python bench.py
