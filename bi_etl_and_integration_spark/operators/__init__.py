"""Operator layer — each module maps a family of reference operators
(SURVEY.md §2) onto idiomatic PySpark DataFrame plans."""
