"""mplan2vdl_tpu — a TPU-native vectorized query-execution framework.

A from-scratch reimplementation of the capabilities of the reference
``orm011/mplan2vdl`` compiler (MonetDB logical plans -> Voodoo VDL), extended
with the execution half the reference delegated to an external Voodoo backend:
here queries are lowered to a vector-IR DAG and executed as a single jitted
JAX/XLA program (with Pallas kernels for the hot ops) on TPU, scaling over a
``jax.sharding.Mesh``.

Layers (mirroring reference layers, see SURVEY.md §1):
  fe/        lexer + plan/schema parsers      (Scanner.x, Parser.y, SchemaParser.y)
  catalog    metadata catalog                 (Config.hs, Types.hs)
  mplan      typed logical plan + rewrites    (Mplan.hs)
  vir        vector IR + metadata inference   (Vlite.hs)
  passes     CSE + peephole passes            (Vlite.hs:1295-1417)
  vdl_emit   textual VDL conformance emitter  (Vdl.hs)
  engine/    TPU execution engine             (replaces the external Voodoo Driver)
  parallel/  multi-chip/multi-host execution  (new; reference had none)
"""

__version__ = "0.1.0"
