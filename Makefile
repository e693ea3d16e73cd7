# Reference parity: percivaltts's Makefile (`make tests` etc., SURVEY.md §2
# "Build/CI") plus targets for the native data plane and the bench harness.

PYTHON ?= python

.PHONY: tests tests-fast native demo demo-data bench clean

tests:
	$(PYTHON) -m pytest tests/ -q

# seconds-tier unit/oracle tests only (~90 s): the edit-test loop.
# `make tests` (or pytest -m slow) adds the minutes-tier e2e/distributed/
# copy-synthesis suites.
tests-fast:
	$(PYTHON) -m pytest tests/ -q -m "not slow"

native:
	$(MAKE) -C native

# fetch the reference's real demo corpus (slt_arctic_merlin_full) and
# normalize it into the Merlin layout compose expects. Needs network
# (this build environment has none — the target then prints how to
# resume from a locally transferred archive via --archive).
demo-data:
	$(PYTHON) -m percivaltts_tpu.data.fetch slt_arctic_corpus

demo:
	$(PYTHON) -m percivaltts_tpu.cli demo --out demo_corpus
	$(PYTHON) -m percivaltts_tpu.cli compose --config demo_corpus/config.json

# full tiny pipeline on the generated corpus: train → generate → plot
demo-e2e: demo
	$(PYTHON) -m percivaltts_tpu.cli train    --config demo_corpus/config.json
	$(PYTHON) -m percivaltts_tpu.cli generate --config demo_corpus/config.json
	$(PYTHON) -m percivaltts_tpu.cli plot     --config demo_corpus/config.json

bench:
	$(PYTHON) bench.py

# one-command reference-parity readiness (VERDICT round-4 item 4):
# checklist -> archive normalize -> compose -> config-3 production train
# -> generate/measures -> filled parity table + stage timings.
#   real archive:  make parity ARCHIVE=/path/to/slt_arctic_merlin_full.tar.gz
#   dry run:       make parity FABRICATE=1100
FABRICATE ?= 0
EPOCHS ?= 40
PARITY_ROOT ?= /tmp/parity
parity:
	$(PYTHON) scripts/parity.py --root $(PARITY_ROOT) --epochs $(EPOCHS) \
		$(if $(ARCHIVE),--archive $(ARCHIVE),) \
		$(if $(filter-out 0,$(FABRICATE)),--fabricate $(FABRICATE),)

clean:
	$(MAKE) -C native clean
	rm -rf demo_corpus exp
