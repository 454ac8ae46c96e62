"""Actor-learner training pipeline (SURVEY.md §1 L5/L6)."""
