"""(placeholder — specs land incrementally)"""
