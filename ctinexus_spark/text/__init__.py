from ctinexus_spark.text.normalize import (  # noqa: F401
    build_cti_focus_text,
    extract_jsonld,
    extract_meta_description,
    is_cti_signal_line,
    is_well_formed_cti_paragraph,
    merge_extraction_candidates,
    normalize_summary_text,
    normalize_text,
)
