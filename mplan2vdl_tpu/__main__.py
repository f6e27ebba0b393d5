"""``python -m mplan2vdl_tpu`` — the reference binary's invocation shape
(src-exec/Main.hs:5-6 delegating to MainFuns.mainf)."""

from .cli import main

main()
