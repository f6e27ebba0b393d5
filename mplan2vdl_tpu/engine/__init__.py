"""TPU execution engine: the half of the system the reference delegated to the
external Voodoo Driver (eval_query.sh:21-27).  A query's vector-IR DAG is
lowered into ONE jitted XLA program over columnar arrays resident in HBM;
hot ops (compaction, segmented reduction, sort, join) are Pallas kernels
with jnp fallbacks."""
