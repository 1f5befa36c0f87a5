"""Regenerate tests/test_formatting_goldens.py from the live renderer.

Run after intentional formatting changes; eyeball the diff before
committing (goldens are a contract, not a snapshot)."""
print("See the generation recipe in git history (round 4); the golden file "
      "documents its own fixture set and case list.")
