#!/bin/bash
# Regenerate the PLANS.md appendix (compact physical-plan trees for every
# catalog query). Keeps the hand-written front matter (everything above the
# "## Appendix" heading) and rewrites the trees below it.
# Usage: sbt compile && tools/plans.sh
set -e
cd "$(dirname "$0")/.."
tools/run.sh graft.Explain /root/testdata/sf0.001 2>/dev/null > /tmp/plans_raw.txt
python3 - <<'EOF'
txt = open('/tmp/plans_raw.txt').read()
trees = []
for block in txt.split('================ ')[1:]:
    name, rest = block.split(' ================', 1)
    lines, tree = rest.strip().splitlines(), []
    for l in lines:
        if l.startswith('== Physical Plan =='):
            continue
        if l.strip() == '' and tree:
            break
        if l.strip():
            tree.append(l)
    # iterative queries (e.g. connected components) print their cached
    # round lineage as an enormous tree — cap it, the head shows the shape
    if len(tree) > 60:
        tree = tree[:60] + [f"... [{len(tree) - 60} more lines: cached iteration lineage elided]"]
    trees.append((name, tree))

head = open('PLANS.md').read()
marker = '## Appendix'
head = head[:head.index(marker)]
with open('PLANS.md', 'w') as f:
    f.write(head)
    f.write('## Appendix — compact trees, all queries (sf0.001, AQE on)\n\n')
    for name, tree in trees:
        f.write(f"### {name}\n```\n" + "\n".join(tree) + "\n```\n\n")
print(f"PLANS.md: {len(trees)} trees")
EOF
