"""Static model accounting report.

Writes ``model_metrics.txt`` with per-layer parameter / activation / FLOP
counts exactly like the reference (train.py:138-161), sourced from the
NetTracer counters populated at init (nn_skeleton.py:127-135 equivalents).
"""

from __future__ import annotations

import os


def write_model_metrics(path: str, tracer) -> None:
    with open(path, 'w') as f:
        f.write('Number of parameter by layer:\n')
        count = 0
        for name, v in tracer.model_size_counter:
            f.write('\t{}: {}\n'.format(name, v))
            count += v
        f.write('\ttotal: {}\n'.format(count))

        count = 0
        f.write('\nActivation size by layer:\n')
        for name, v in tracer.activation_counter:
            f.write('\t{}: {}\n'.format(name, v))
            count += v
        f.write('\ttotal: {}\n'.format(count))

        count = 0
        f.write('\nNumber of flops by layer:\n')
        for name, v in tracer.flop_counter:
            f.write('\t{}: {}\n'.format(name, v))
            count += v
        f.write('\ttotal: {}\n'.format(count))
    print('Model statistics saved to {}.'.format(path))
