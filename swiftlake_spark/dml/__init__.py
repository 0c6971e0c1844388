"""DML builders: insert / insert-overwrite / update / delete / SCD1 / SCD2.

Fluent API mirroring the reference's command builders
(``engine.insertInto(t).sql(src).execute()`` etc., SURVEY.md §2.A rows
A10-A17), executing as DataFrame pipelines over the table format.
"""
