"""``python -m gorse_tpu.cmd._spawn {master|server|worker} [args...]``

Process harness used by the integration tests (and handy without installed
console scripts): dispatches to the role entrypoints in nodes_main.
"""

import sys

from . import nodes_main


def main() -> None:
    role = sys.argv[1]
    sys.argv = [f"gorse-tpu-{role}"] + sys.argv[2:]
    {
        "master": nodes_main.master_main,
        "server": nodes_main.server_main,
        "worker": nodes_main.worker_main,
    }[role]()


if __name__ == "__main__":
    main()
