"""CLI entry point.

Parity target: /root/reference/entry.py (:40-70) + run launcher: dispatch
``train`` / ``evaluate`` with stacked YAML configs and dotted overrides.
No mpirun wrapper — multi-host launch is handled by the JAX coordination
service (set JAX_COORDINATOR_ADDRESS; see iuvl_tpu.runtime.mesh).

Usage:
    python entry.py train --conf_files configs/step1.yaml \
        --overrides SOLVER.BASE_LR 0.0001
    python entry.py evaluate --conf_files configs/step1.yaml
"""

from __future__ import annotations

import json
import logging
import sys

from iuvl_tpu.config import load_opt_command


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    cfg, args = load_opt_command(argv)

    if args.command == "bench":
        import bench

        bench.main()
        return 0

    from iuvl_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    if args.command == "train":
        result = trainer.train()
    else:
        result = trainer.eval()
    print(json.dumps({k: float(v) if hasattr(v, "__float__") else v
                      for k, v in result.items()}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
