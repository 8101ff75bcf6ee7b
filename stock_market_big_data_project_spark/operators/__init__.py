"""Composable DataFrame -> DataFrame transforms (SURVEY.md §2).

Each module groups one operator family; every public function is a pure
transform so plans stay lazy and Catalyst sees the whole DAG.
"""
