"""Command-line entry points.

Mirrors the reference's CLI surface (flag names and file conventions) so a
PopPUNK user can switch directly:

    poppunk_tpu            <-> poppunk          (__main__.py)
    poppunk_tpu_assign     <-> poppunk_assign   (assign.py)
    poppunk_tpu_visualise  <-> poppunk_visualise (visualise.py)
    poppunk_tpu_mst        <-> poppunk_mst      (sparse_mst.py)
    poppunk_tpu_mandrake   <-> poppunk_mandrake (mandrake.py)
    poppunk_tpu_references <-> poppunk_references (reference_pick.py)
    poppunk_tpu_info       <-> poppunk_info     (info.py)
    poppunk_tpu_lineages   <-> poppunk_lineages (lineages.py)
"""
