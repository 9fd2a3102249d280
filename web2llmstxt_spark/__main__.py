"""``python -m web2llmstxt_spark``: the reference's dual entry surface
(__main__.py / run.py / start.py): no arguments on a TTY -> the interactive
menu flow (interactive.py); any arguments -> the flag-driven CLI (cli.py)."""

from __future__ import annotations

import sys


def main() -> int:
    if len(sys.argv) > 1:
        from .cli import main as cli_main

        return cli_main(sys.argv[1:])
    from .interactive import interactive_main

    interactive_main()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
