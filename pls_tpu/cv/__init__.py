"""Cross-validation: batched LOO / LSO (Monte-Carlo) / new-data validators,
PRESS/MSE summaries, and Wilcoxon-based optimal-component selection."""
