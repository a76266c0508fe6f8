from sesr_tpu.export.vectors import (
    export_input_tiles, export_param_buf, export_pe_out, export_pe_add,
    export_requant_shifts, export_end2end, export_all,
)
