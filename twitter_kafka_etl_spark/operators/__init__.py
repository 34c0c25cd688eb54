"""Engine operators (SURVEY.md §2.2-§2.8 + LLM-pipeline extensions)."""
