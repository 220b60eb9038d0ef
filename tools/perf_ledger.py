"""Append-only per-stage performance ledger (``PERF.jsonl`` at the repo
root).

The driver's ``BENCH_r*.json`` tracks only the joint-step headline;
NeRF-step, distillation-march, and whole-pipeline wall-clock changes
were previously recorded only in QUALITY.md prose, invisible to
round-over-round regression checks. This ledger gives every measured
stage one machine-readable line per measurement:

    {"ts": ..., "git": ..., "stage": ..., "value": ..., "unit": ...,
     "config": ..., "note": ...}

Rows are appended by the measurement tools themselves (``bench.py``,
``tools/march_probe.py``, ``tools/quality_e2e.py``) -- never edited by
hand. Historical rows reconstructed from the QUALITY.md/BENCH ledgers
carry ``"reconstructed": true`` and name their source.
"""

import datetime
import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, 'PERF.jsonl')


def _git_rev():
    try:
        return subprocess.run(
            ['git', '-C', REPO, 'rev-parse', '--short', 'HEAD'],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        return None


def append(stage, value, unit, config='', note='', **extra):
    """Appends one measurement row; never raises (a failed ledger write
    must not fail the measurement that produced it)."""
    rec = {
        'ts': datetime.datetime.now().strftime('%Y-%m-%dT%H:%M:%S'),
        'git': _git_rev(),
        'stage': stage,
        'value': round(float(value), 4),
        'unit': unit,
    }
    if config:
        rec['config'] = config
    if note:
        rec['note'] = note
    rec.update(extra)
    try:
        with open(PATH, 'a') as h:
            h.write(json.dumps(rec) + '\n')
    except OSError:
        pass
    return rec
