package org.apache.seatunnel.api.table.catalog;

import org.apache.seatunnel.api.table.type.SeaTunnelDataType;

/**
 * Concrete column factory used by the reference's DynamicCompile e2e
 * snippets (`PhysicalColumn.of("col1", BasicType.STRING_TYPE, 10, true,
 * "", "")`). Graft shim: length/default/comment are accepted for source
 * compatibility; Spark needs only (name, type, nullable).
 */
public class PhysicalColumn extends Column {

    protected PhysicalColumn(String name, SeaTunnelDataType<?> dataType, boolean nullable) {
        super(name, dataType, nullable);
    }

    public static PhysicalColumn of(
            String name,
            SeaTunnelDataType<?> dataType,
            Integer columnLength,
            boolean nullable,
            Object defaultValue,
            String comment) {
        return new PhysicalColumn(name, dataType, nullable);
    }

    public static PhysicalColumn of(
            String name,
            SeaTunnelDataType<?> dataType,
            Long columnLength,
            Integer scale,
            boolean nullable,
            Object defaultValue,
            String comment) {
        return new PhysicalColumn(name, dataType, nullable);
    }
}
