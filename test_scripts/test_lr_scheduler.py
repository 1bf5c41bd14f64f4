"""Plot the learning-rate schedules over iterations
(reference: test_scripts/test_lr_scheduler.py — dumps a PNG instead of
showing a window)."""

import sys
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from basicsr4rs_tpu.models.lr_scheduler import build_schedule  # noqa: E402


def main():
    total = 400_000
    schedules = {
        'MultiStepLR': build_schedule(2e-4, {'type': 'MultiStepLR',
                                             'milestones': [100_000, 200_000, 300_000],
                                             'gamma': 0.5}, -1),
        'CosineRestart': build_schedule(2e-4, {'type': 'CosineAnnealingRestartLR',
                                               'periods': [100_000] * 4,
                                               'restart_weights': [1, 0.5, 0.5, 0.25],
                                               'eta_min': 1e-7}, -1),
        'Warmup+MultiStep': build_schedule(2e-4, {'type': 'MultiStepLR',
                                                  'milestones': [200_000], 'gamma': 0.1},
                                           10_000),
    }
    steps = np.arange(0, total, 500)
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        for name, sched in schedules.items():
            plt.plot(steps, [float(sched(s)) for s in steps], label=name)
        plt.legend()
        plt.xlabel('iteration')
        plt.ylabel('lr')
        plt.savefig('lr_schedules.png', dpi=120)
        print('saved lr_schedules.png')
    except ImportError:
        for name, sched in schedules.items():
            samples = [float(sched(s)) for s in (0, 10_000, 100_000, 250_000, 399_999)]
            print(name, ['%.2e' % v for v in samples])


if __name__ == '__main__':
    main()
