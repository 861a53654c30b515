CREATE OR REPLACE VIEW virtual_entity."v-region" AS
SELECT name
FROM (VALUES ('north'), ('south'), ('no;man;land')) AS s(name);

SELECT directory.create_entity_type('v-region');

INSERT INTO entity."v-region" (name)
SELECT name FROM virtual_entity."v-region"
ON CONFLICT DO NOTHING;
