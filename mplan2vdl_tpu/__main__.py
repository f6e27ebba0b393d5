"""``python -m mplan2vdl_tpu`` — the CLI driver (see cli.py)."""

from .cli import main

main()
