"""Training-curve extraction helpers (reference: basicsr/utils/plot_util.py:4-83)."""

from __future__ import annotations

import re


def read_data_from_tensorboard(log_path, tag):
    """Return (steps, values) for ``tag`` from a tensorboard event file."""
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator
    event_acc = EventAccumulator(log_path)
    event_acc.Reload()
    print('tag list: ', event_acc.Tags()['scalars'])
    scalars = event_acc.Scalars(tag)
    return [int(s.step) for s in scalars], [s.value for s in scalars]


def read_data_from_txt_2v(path, pattern, step_one=False):
    """Scrape (step, value) pairs from a log file with a 2-group regex."""
    regex = re.compile(pattern)
    steps, values = [], []
    with open(path) as f:
        for line in f:
            match = regex.match(line.strip())
            if match:
                steps.append(int(match.group(1)))
                values.append(float(match.group(2)))
    if step_one:
        steps = [v + 1 for v in steps]
    return steps, values


def read_data_from_txt_1v(path, pattern):
    """Scrape single values from a log file with a 1-group regex."""
    regex = re.compile(pattern)
    data = []
    with open(path) as f:
        for line in f:
            match = regex.match(line.strip())
            if match:
                data.append(float(match.group(1)))
    return data


def smooth_data(values, smooth_weight):
    """Tensorboard-style 1st-order IIR smoothing."""
    out = []
    last = values[0]
    for value in values:
        last = last * smooth_weight + (1 - smooth_weight) * value
        out.append(last)
    return out
