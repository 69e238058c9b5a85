"""Stable-tier Whisper distributed job.

The reference's stable_jobs/whisper_dist.py is byte-identical to
speech_jobs/whisper_dist.py (SURVEY quirk #2); this entry point accordingly
delegates to the same job.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from jobs.whisper_dist import main  # noqa: E402

if __name__ == "__main__":
    main()
