"""Host-side matplotlib diagnostics (reference: `src/*/plots_*.py`)."""

import matplotlib

matplotlib.use("Agg")
