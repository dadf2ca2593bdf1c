"""Ray Data batch-transform stages (Arrow in / Arrow out)."""
